"""Cache-priming tool (tools/warm_cache.py): the primed program set must
match what the production driver would compile, built from shape specs only
(nothing executes, no device buffers are born)."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

import warm_cache  # noqa: E402


class TestWarmCache:
    def test_primes_horizon_and_chunk_programs(self):
        msgs = []
        timings = warm_cache.warm_horizon_programs(
            4, 4, [1], maxiter=2, chunked=True, log=msgs.append
        )
        names = sorted(timings)
        assert any(n.endswith("_horizon") for n in names), names
        assert any(n.endswith("_chunk_init") for n in names), names
        assert any(n.endswith("_chunk_loop") for n in names), names
        assert all(t > 0 for t in timings.values())

    def test_non_reference_impl_primes_watchdog_programs(self):
        from aqc_research_tpu import config

        # Force a non-reference SVD route: the watchdog's reference value
        # program and the recovery runner must be primed too.
        old = config.svd_impl()
        config.set_svd_impl("gram")
        try:
            timings = warm_cache.warm_horizon_programs(
                4, 4, [1], maxiter=2, log=lambda *_: None
            )
        finally:
            config.set_svd_impl(old)
        names = sorted(timings)
        assert any("_watchdog_value" in n for n in names), names
        assert any("_recovery[" in n for n in names), names
