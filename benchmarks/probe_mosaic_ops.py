"""Probe: Mosaic TPU support for the ops the fused pair-update kernel needs.

Checks, in ONE pallas kernel on the real chip:
  * jnp.dot with preferred_element_type=f32 (MXU),
  * jax.lax.dot_general with contracting dims ((1,),(1,)) (A @ B^T),
  * 2D transpose in VMEM (jnp.swapaxes),
  * SMEM scalar input reads,
  * VMEM scratch buffers,
  * static leading-index slicing of a (chunk, 2, n, n) ref.

Every output is FETCHED and checked against NumPy (measurement discipline:
failures on this runtime only surface at device->host transfer).
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 128
    chunk = 2

    def kernel(scal_ref, a_ref, b_ref, o_dot_ref, o_dgt_ref, o_tr_ref, scratch):
        for i in range(chunk):
            a = a_ref[i, 0]
            b = b_ref[i, 1]
            scratch[:] = jnp.dot(a, b, preferred_element_type=jnp.float32)
            o_dot_ref[i] = scratch[:] * scal_ref[0, 0]
            o_dgt_ref[i] = jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_tr_ref[i] = jnp.swapaxes(a, 0, 1)

    rng = np.random.default_rng(0)
    a = rng.standard_normal((chunk, 2, n, n)).astype(np.float32)
    b = rng.standard_normal((chunk, 2, n, n)).astype(np.float32)
    scal = np.array([[2.5]], dtype=np.float32)

    out = jax.ShapeDtypeStruct((chunk, n, n), jnp.float32)
    spec = pl.BlockSpec((chunk, 2, n, n), lambda: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((chunk, n, n), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=(out, out, out),
        in_specs=[
            pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM),
            spec, spec,
        ],
        out_specs=(ospec, ospec, ospec),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
    )
    o_dot, o_dgt, o_tr = jax.jit(fn)(scal, a, b)

    ref_dot = np.einsum("cij,cjk->cik", a[:, 0], b[:, 1]) * 2.5
    ref_dgt = np.einsum("cij,ckj->cik", a[:, 0], b[:, 1])
    ref_tr = np.swapaxes(a[:, 0], -1, -2)
    for name, got, ref in [
        ("dot", o_dot, ref_dot), ("dot_general_T", o_dgt, ref_dgt),
        ("transpose", o_tr, ref_tr),
    ]:
        got = np.asarray(got)  # FETCH
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-30)
        print(f"{name}: rel err {err:.2e} {'OK' if err < 1e-5 else 'FAIL'}")


if __name__ == "__main__":
    main()
