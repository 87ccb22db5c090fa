"""aqc_research_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Approximate Quantum Compiling (AQC) and Approximate State Preparation (ASP).

Re-designed from scratch with the capabilities of the reference library
``qiskit-community/aqc-research`` (see SURVEY.md for the component map):

* ``circuit``   — parametric-ansatz IR (static, hashable) + structure generators
* ``ops``       — statevector / dense-matrix / MPS engines and analytic
                  co-sweep gradients, all functional JAX
* ``optim``     — jitted L-BFGS / Adam loops, stoppers, gradient amplifier
* ``targets``   — Trotter evolution, target state/unitary generators, caches
* ``models``    — ASP (model_sp_lhs) and AQC-sketching (model_sketching) drivers
* ``parallel``  — vmap/shard_map multi-start executor, device-mesh utilities
* ``utils``     — logging, timers, RNG helpers, folders
"""

__version__ = "0.1.0"

from . import config  # noqa: F401  (enables x64, defines precision policy)
