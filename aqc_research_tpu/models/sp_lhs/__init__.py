"""ASP (approximate state preparation) model with local Hilbert-Schmidt terms."""

from .jit_asp import make_surrogate_loss, optimize_horizon_jit
from .objective_base import (
    GenericStateHandler,
    MpsStateHandler,
    SpLHSObjectiveBase,
    SpService,
    ThinStateHandler,
)
from .sur_fast_mps import SpSurrogateObjectiveFastMpsTrotter
from .sur_max import SpSurrogateObjectiveMax
from .time_evol import run_simulation
from .user_options import UserOptions
