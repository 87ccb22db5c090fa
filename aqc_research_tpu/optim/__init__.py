"""Optimization layer: jitted L-BFGS/Adam, SciPy-backed AqcOptimizer, stoppers."""

from .lbfgs import JitMinimizeResult, minimize_adam, minimize_lbfgs
from .optimizer import AqcOptimizer, AQCOptimResult
from .stoppers import (
    EarlyStopper,
    GradientAmplifier,
    NotImproveStopper,
    SmallObjectiveStopper,
    StagnantOptimizationWarning,
    TimeoutChecker,
    TimeoutStopper,
)
