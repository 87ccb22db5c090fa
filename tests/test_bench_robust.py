"""Outage robustness of the headline benchmark harness (bench.py).

Round 3 lost its driver capture to a hung axon tunnel: bench.py blocked in
backend init for >= 25 minutes and died on the driver's timeout with rc=124
and NO output.  The harness now guarantees one parseable JSON line on any
failure (probe timeout, child timeout, child crash) carrying "error" and the
provenance of the stale number it reports instead.  These tests exercise
that contract without touching any accelerator.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _load_bench():
    sys.path.insert(0, REPO)
    import importlib

    import bench

    return importlib.reload(bench)


class TestFailureLine:
    def test_simulated_outage_prints_one_parseable_json_line(self):
        env = dict(os.environ, AQC_TPU_BENCH_FORCE_OUTAGE="1")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, BENCH],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            timeout=60,
        )
        assert time.time() - t0 < 30, "outage path must fail fast, not hang"
        assert proc.returncode == 0
        lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
        assert len(lines) == 1, f"expected exactly one line, got: {lines}"
        rec = json.loads(lines[0])
        for key in ("metric", "value", "unit", "vs_baseline", "error", "provenance"):
            assert key in rec, f"missing {key} in failure record"
        assert "outage" in rec["error"]
        # The stale number must be flagged as stale, not mistakable for fresh.
        assert "BENCH_r02" in rec["provenance"]

    def test_failure_line_shape_matches_success_contract(self):
        bench = _load_bench()
        rec = json.loads(bench._failure_line("x"))
        assert rec["metric"] == bench.METRIC
        assert rec["unit"] == "s"
        assert isinstance(rec["value"], float)
        assert isinstance(rec["vs_baseline"], float)


class TestProbeRetry:
    """Round-5 hardening: the probe retries instead of losing the capture
    to one transient failure (weak #1 of the round-4 review)."""

    def test_probe_failure_is_retried_and_reported_with_attempt_count(self, tmp_path):
        marker = tmp_path / "attempts"
        probe_src = (
            "import sys, pathlib\n"
            f"p = pathlib.Path({str(marker)!r})\n"
            "p.write_text(p.read_text() + 'x' if p.exists() else 'x')\n"
            "sys.exit(3)\n"
        )
        env = dict(
            os.environ,
            AQC_TPU_BENCH_PROBE_SRC=probe_src,
            AQC_TPU_BENCH_PROBE_ATTEMPTS="3",
        )
        proc = subprocess.run(
            [sys.executable, BENCH],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        assert "3 attempts" in rec["error"]
        assert marker.read_text() == "xxx", "probe must run once per attempt"

    def test_transient_probe_failure_recovers_on_retry(self, tmp_path):
        # Fails on the first attempt, succeeds on the second; the benchmark
        # child itself is forced to fail fast so no accelerator is touched —
        # recovery is proven by the error naming the CHILD, not the probe.
        marker = tmp_path / "attempts"
        probe_src = (
            "import sys, pathlib\n"
            f"p = pathlib.Path({str(marker)!r})\n"
            "n = len(p.read_text()) if p.exists() else 0\n"
            "p.write_text('x' * (n + 1))\n"
            "sys.exit(0 if n >= 1 else 5)\n"
        )
        env = dict(
            os.environ,
            AQC_TPU_BENCH_PROBE_SRC=probe_src,
            AQC_TPU_BENCH_PROBE_ATTEMPTS="3",
            AQC_TPU_BENCH_BUDGET="60",
            AQC_TPU_BENCH_CHILD_ARGV="-c,import sys; sys.exit(9)",
        )
        proc = subprocess.run(
            [sys.executable, BENCH],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        assert "probe" not in rec["error"]
        assert "rc=9" in rec["error"]
        assert marker.read_text() == "xx"


class TestBoundedRunner:
    def test_bounded_kills_hung_child_and_reports_124(self):
        bench = _load_bench()
        t0 = time.time()
        rc, last, _ = bench._bounded(
            [sys.executable, "-c", "import time; time.sleep(60)"], timeout=2.0
        )
        assert rc == 124
        assert time.time() - t0 < 15

    def test_bounded_returns_last_stdout_line(self):
        bench = _load_bench()
        rc, last, _ = bench._bounded(
            [sys.executable, "-c", "print('noise'); print('{\"a\": 1}')"],
            timeout=30,
        )
        assert rc == 0
        assert json.loads(last) == {"a": 1}

    def test_bounded_reports_child_crash(self):
        bench = _load_bench()
        rc, last, err = bench._bounded(
            [sys.executable, "-c", "import sys; sys.exit(7)"], timeout=30
        )
        assert rc == 7
