"""Multi-host skeleton (parallel/distributed.py): guarded init, DCN-aware
mesh construction, and a REAL two-process-on-localhost smoke test.

Covers SURVEY.md §2.4 "Distributed comm backend" (the capability the
reference lacks entirely — joblib shares nothing, job_executor.py:141-143).
"""

import os
import socket
import subprocess
import sys

import numpy as np

import jax

from aqc_research_tpu.parallel.distributed import (
    global_mesh,
    initialize_distributed,
    is_multiprocess,
)


class TestGuardedInit:
    def test_noop_without_coordinator(self):
        """No coordinator configured -> single-process, untouched runtime."""
        for env in ("AQC_TPU_COORDINATOR", "JAX_COORDINATOR_ADDRESS"):
            assert not os.environ.get(env)
        assert initialize_distributed() is False
        assert not is_multiprocess()
        assert jax.process_count() == 1


class TestGlobalMesh:
    def test_single_slice_mesh(self):
        n = len(jax.devices())
        mesh = global_mesh((n,), ("dp",))
        assert mesh.devices.shape == (n,)
        assert mesh.axis_names == ("dp",)

    def test_two_axis_mesh(self):
        n = len(jax.devices())
        assert n % 2 == 0
        mesh = global_mesh((2, n // 2), ("dp", "tp"))
        assert mesh.devices.shape == (2, n // 2)
        assert set(d.id for row in mesh.devices for d in row) == set(
            d.id for d in jax.devices()
        )

    def test_default_axis_sizes(self):
        n = len(jax.devices())
        mesh = global_mesh()
        assert mesh.devices.shape == (n, 1)


class TestTwoProcessLocalhost:
    def test_two_process_psum(self):
        """Two OS processes join one JAX runtime via
        jax.distributed.initialize (Gloo on CPU), build a global 4-device
        mesh, and jointly reduce a dp-sharded global array."""
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

        worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(port), str(i)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"
            assert f"proc {i} OK total=6.0" in out, out
