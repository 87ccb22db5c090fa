"""Command-line launcher of the ASP time-evolution simulation.

The reference README documents a ``run_time_evol.py`` launcher that is not
shipped in its repo (users write it themselves; see SURVEY.md L7 note).  This
framework ships it: ``python -m aqc_research_tpu.models.sp_lhs.run_time_evol
-n 12 [-t] [-g tag] [-f targets_file]``.
"""

from __future__ import annotations

from argparse import ArgumentParser

from ...utils import create_logger, script_entry_point
from .evol_utils import get_commandline_args
from .time_evol import run_simulation
from .user_options import UserOptions

_logger = create_logger(__file__)


def main() -> None:
    cargs = get_commandline_args(ArgumentParser(description=__doc__))

    # Platform / precision policy: f64 parity precision needs the CPU
    # backend (set via the config API — the env var alone is overridden by
    # TPU platform plugins); TPU-like backends have no complex128, so the
    # production run there uses the fast f32/c64 policy.
    from ...config import is_tpu, set_precision

    if getattr(cargs, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
        set_precision("high")
    elif is_tpu():
        set_precision("fast")

    opts = UserOptions(cargs)
    script_entry_point(lambda o: run_simulation(o), opts, _logger)


if __name__ == "__main__":
    main()
