"""Probe: f32 MXU precision control INSIDE Mosaic kernels.

probe_mosaic_ops.py measured that in-kernel jnp.dot with
preferred_element_type=f32 still truncates inputs to bf16 (2e-3 rel err) —
the global jax_default_matmul_precision=highest does NOT reach Mosaic.
This probe checks precision=HIGHEST on lax.dot_general inside the kernel,
for both the plain and the transposed-contraction forms.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 128
    HI = jax.lax.Precision.HIGHEST

    def kernel(a_ref, b_ref, o1_ref, o2_ref):
        a = a_ref[:]
        b = b_ref[:]
        o1_ref[:] = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        o2_ref[:] = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal((n, n)).astype(np.float32)

    out = jax.ShapeDtypeStruct((n, n), jnp.float32)
    spec = pl.BlockSpec((n, n), lambda: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(), out_shape=(out, out),
        in_specs=[spec, spec], out_specs=(spec, spec),
    )
    o1, o2 = jax.jit(fn)(a, b)

    ref1 = a.astype(np.float64) @ b.astype(np.float64)
    ref2 = a.astype(np.float64) @ b.T.astype(np.float64)
    for name, got, ref in [("dot HIGHEST", o1, ref1), ("dotT HIGHEST", o2, ref2)]:
        got = np.asarray(got)  # FETCH
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"{name}: rel err {err:.2e} {'OK' if err < 1e-5 else 'FAIL'}")


if __name__ == "__main__":
    main()
