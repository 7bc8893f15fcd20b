"""Pallas TPU kernels for the dense row-cluster operator.

The XLA einsum for the batched [P, R, W] × [P, W] contraction reaches ~40%
of HBM bandwidth on v5e; this kernel pipelines one cluster block per grid
step through VMEM (Mosaic double-buffers the HBM→VMEM loads between grid
steps) and runs the GEMV on the MXU.  Layout requirements (the
DenseBlockSpMV builder pads to them): R % 8 == 0 and W % 128 == 0.
Vectors are passed as [P, 1, W] / produced as [P, 1, R] so every block
shape satisfies Mosaic's (8,128)-or-full-dim tiling rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kernel(x_ref, blocks_ref, out_ref):
    # x_ref [1, 1, W]; blocks_ref [1, R, W]; out_ref [1, 1, R]
    out_ref[0] = jax.lax.dot_general(
        x_ref[0], blocks_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@jax.jit
def dense_block_mv_pallas(blocks, xs):
    """blocks [P, R, W] f32, xs [P, W] f32 → y [P, R] f32.

    Wrapped in disable_x64: under jax_enable_x64 the grid index maps trace
    to i64 scalars, which Mosaic cannot legalize ('func.return' error)."""
    from jax.experimental import pallas as pl

    P, R, W = blocks.shape
    with jax.enable_x64(False):
        y3 = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((P, 1, R), blocks.dtype),
            grid=(P,),
            in_specs=[
                pl.BlockSpec((1, 1, W), lambda p: (p, 0, 0)),
                pl.BlockSpec((1, R, W), lambda p: (p, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, R), lambda p: (p, 0, 0)),
        )(xs.reshape(P, 1, W), blocks)
    return y3.reshape(P, R)


def dense_block_mv_lowp_pallas(blocks, xs):
    """blocks [P, R, W] low-precision store (bf16), xs [P, W] f32 →
    y [P, R] f32 — the level-1 Schwarz batched matvec.

    dot_general per nblk-block with f32 accumulation; BIT-EXACT vs
    `einsum(..., preferred_element_type=f32)` (validated on v5e).  Paired
    with the W % 128 != 0 width rule (la/dense_blocks.from_csr): the
    loop-invariant inverse gets VMEM-promoted and the apply runs ABOVE
    the HBM roofline (measured 35-45 us vs 78-100 for the einsum at
    [544, 128, 368])."""
    from jax.experimental import pallas as pl

    P, R, W = blocks.shape
    nblk = next(b for b in (16, 8, 4, 2, 1) if P % b == 0)

    def _k(x_ref, b_ref, o_ref):
        y = jax.lax.dot_general(b_ref[...], x_ref[...],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[...] = y.transpose(0, 2, 1)

    with jax.enable_x64(False):
        y3 = pl.pallas_call(
            _k,
            out_shape=jax.ShapeDtypeStruct((P, 1, R), jnp.float32),
            grid=(P // nblk,),
            in_specs=[pl.BlockSpec((nblk, 1, W), lambda p: (p, 0, 0)),
                      pl.BlockSpec((nblk, R, W), lambda p: (p, 0, 0))],
            out_specs=pl.BlockSpec((nblk, 1, R), lambda p: (p, 0, 0)),
        )(xs.reshape(P, 1, W).astype(blocks.dtype), blocks)
    return y3.reshape(P, R)


def use_pallas_lowp(store_dtype, R) -> bool:
    """Route the LOW-PRECISION-store batched matvec through Pallas
    (default ON for bf16 on TPU; opt out with FEDD_NO_PALLAS_L1=1).
    Unlike the f32 kernel below (loop-aliasing defect under while_loop
    buffer reuse), this kernel is bit-exact vs the einsum and validated
    inside fori_loop chains and the GMRES IR anchor on v5e."""
    import os

    if os.environ.get("FEDD_NO_PALLAS_L1") == "1":
        return False
    try:
        return (jnp.dtype(store_dtype) == jnp.bfloat16 and R % 8 == 0
                and jax.default_backend() not in ("cpu",)
                and pallas_available())
    except Exception:
        return False


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas  # noqa: F401

        return True
    except Exception:
        return False


def use_pallas_dense(dtype) -> bool:
    """Trace-time policy for routing the dense-block GEMV through Pallas.

    OPT-IN via FEDD_USE_PALLAS=1.  Standalone the kernel measures ~0.36 ms
    (~866 GB/s ≈ stream speed-of-light) vs ~0.8-1.0 ms for the XLA einsum at
    [256,400,768] on v5e AND matches the einsum bit-for-bit.  Composed
    inside a lax.while_loop, however, it applies a *consistent but wrong*
    operator on this toolchain (A/B at [64,344,640]: GMRES internal
    residual 8e-7 while the true residual stays 0.24 — a Mosaic
    layout/aliasing defect under loop buffer reuse, axon v5e stack).
    Default stays on the proven einsum path."""
    import os

    if os.environ.get("FEDD_USE_PALLAS") != "1":
        return False
    try:
        return (jnp.dtype(dtype) == jnp.float32
                and jax.default_backend() not in ("cpu",)
                and pallas_available())
    except Exception:
        return False
