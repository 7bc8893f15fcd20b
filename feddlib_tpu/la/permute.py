"""Permutation gather — y[i] = x[idx[i]] as a windowed Pallas kernel.

The distributed/padded operators move vectors through static index plans
(cluster ghost fetch, padded-space entry/exit, halo packing).  XLA lowers
a TPU gather to a ~6-15 ns/element serial loop, and expressing the plan as
a 0/1 windowed-SELL SpMV (round 3) pays the full K-pass select loop of the
general kernel (the E=8 slot padding makes each chunk touch up to 16
column windows — measured ~140 us for the 127k-element bench ghost plan,
~60% of a level-1 Schwarz apply).  This kernel exploits that a PERMUTATION
needs no reduction: outputs are laid out densely, each output lane's slot
sits in the sublane of its column window, so the apply per 128-output
chunk is: build the <=8 window rows (dynamic VMEM row loads), ONE
take_along_axis (each sublane gathers from its own window), mask-multiply,
and a sublane sum.  No K-pass loop, ~13 VPU ops / 128 outputs.

Outputs whose chunk touches more than 8 distinct 128-blocks of x spill to
a plain XLA gather tail (kept tiny by construction: plan targets are
sorted runs).  idx < 0 yields 0.0 (pad slots).

Reference role: Tpetra Import plan execution (the gather half);
SURVEY.md §2.9 halo exchange backend.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class PermutationGather:
    """Static plan for y = x[idx] (idx int64 [N_out], -1 -> 0)."""

    def __init__(self, idx: np.ndarray, n_in: int):
        idx = np.asarray(idx, dtype=np.int64)
        N = len(idx)
        self.n_out = N
        self.n_in = n_in
        nchunks = max(_round_up(N, _LANES) // _LANES, 1)
        self.nchunks = nchunks

        lane = np.arange(N) % _LANES
        chunk = np.arange(N) // _LANES
        valid = idx >= 0
        blk = np.where(valid, idx // _LANES, 0)

        # per chunk: distinct blocks ranked by frequency, top-8 kept
        keys = chunk * (1 << 32) + blk
        keys = keys[valid]
        uk, inv, counts = np.unique(keys, return_inverse=True,
                                    return_counts=True)
        uc = (uk >> 32).astype(np.int64)
        ub = (uk & 0xFFFFFFFF).astype(np.int64)
        order = np.lexsort((-counts, uc))
        rank = np.empty(len(uk), np.int64)
        starts = np.searchsorted(uc[order], np.arange(nchunks))
        rank[order] = np.arange(len(uk)) - starts[uc[order]]
        kept_blk = rank < 8
        gwin = np.zeros((nchunks, 8), np.int32)
        gwin[uc[kept_blk], rank[kept_blk]] = ub[kept_blk].astype(np.int32)

        sub_v = rank[inv]           # per valid output: sublane or >=8
        ok_v = sub_v < 8
        v_pos = np.flatnonzero(valid)
        ok_pos = v_pos[ok_v]

        midx = np.zeros((nchunks, 8, _LANES), np.int16)
        mask = np.zeros((nchunks, 8, _LANES), np.float32)
        midx[chunk[ok_pos], sub_v[ok_v], lane[ok_pos]] = \
            (idx[ok_pos] % _LANES).astype(np.int16)
        mask[chunk[ok_pos], sub_v[ok_v], lane[ok_pos]] = 1.0

        sp_pos = v_pos[~ok_v]
        self.n_spill = len(sp_pos)
        self.spill_out = (jnp.asarray(sp_pos.astype(np.int32))
                          if len(sp_pos) else None)
        self.spill_src = (jnp.asarray(idx[sp_pos].astype(np.int32))
                          if len(sp_pos) else None)
        self.midx = jnp.asarray(midx)
        self.mask = jnp.asarray(mask)
        self.gwin = jnp.asarray(gwin)

    def operands(self):
        return (self.midx, self.mask, self.gwin, self.spill_out,
                self.spill_src)

    def operator(self):
        """(pure_fn, operands); fn(ops, x [n_in_padded ok]) -> y [n_out].
        Closes over static layout only (memoized per layout for solver
        program caching)."""
        key = (self.n_out, self.n_in, self.nchunks)
        fn = _op_cache.get(key)
        if fn is None:
            n_out, n_in = self.n_out, self.n_in

            def fn(ops, x):
                return _permute_apply(*ops, x, n_out, n_in)

            _op_cache[key] = fn
        return fn, self.operands()

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fn, ops = self.operator()
        return fn(ops, x)


_op_cache: dict = {}


def _permute_apply(midx, mask, gwin, spill_out, spill_src, x, n_out, n_in):
    out_dtype = x.dtype
    use_pallas = _use_pallas() and jnp.dtype(out_dtype) == jnp.float32
    nx2 = max(_round_up(n_in, _LANES) // _LANES, 1)
    xf = x.reshape(-1)
    wdtype = jnp.float32 if use_pallas else out_dtype
    x2d = jnp.zeros(nx2 * _LANES, wdtype).at[:n_in].set(
        xf.astype(wdtype)).reshape(nx2, _LANES)
    if use_pallas:
        y = _permute_pallas(midx, mask, gwin, x2d)
    else:
        y = _permute_xla(midx, mask, gwin, x2d)
    y = y.reshape(-1)[:n_out]
    if spill_out is not None:
        y = y.at[spill_out].set(x2d.reshape(-1)[spill_src])
    return y.astype(out_dtype)


def _use_pallas() -> bool:
    import os

    if os.environ.get("FEDD_NO_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _permute_xla(midx, mask, gwin, x2d):
    """CPU/reference path, identical semantics (runs in x2d's dtype)."""
    win = x2d[gwin]                                    # [nchunks, 8, 128]
    g = jnp.take_along_axis(win, midx.astype(jnp.int32), axis=2)
    return (mask.astype(x2d.dtype) * g).sum(axis=1)    # [nchunks, 128]


def _make_kernel(C):
    def kernel(gwin_ref, x_ref, midx_ref, mask_ref, out_ref):
        g = pl.program_id(0)
        ones = jnp.ones((1, 8), jnp.float32)
        rows = []
        for c in range(C):
            win = jnp.concatenate(
                [jnp.broadcast_to(x_ref[gwin_ref[g * C + c, s]],
                                  (1, _LANES)) for s in range(8)], axis=0)
            rows.append(win)
        src = jnp.concatenate(rows, axis=0)            # [C*8, 128]
        m_idx = midx_ref[:].reshape(C * 8, _LANES).astype(jnp.int32)
        gk = jnp.take_along_axis(src, m_idx, axis=1)
        contrib = (mask_ref[:].reshape(C * 8, _LANES) * gk).reshape(
            C, 8, _LANES)
        # sublane sum per chunk via a tiny matmul (batch over chunks)
        y = jax.lax.dot_general(
            ones, contrib.reshape(C, 8, _LANES),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # [1, C, 128]
        out_ref[:] = y[0]

    return kernel


def _permute_pallas(midx, mask, gwin, x2d, C=32):
    nchunks = midx.shape[0]
    MAXC = 1 << 11  # SMEM prefetch-table budget (rows padded to 128 lanes)
    if nchunks > MAXC:
        seg = (MAXC // 2) // C * C
        return jnp.concatenate(
            [_permute_pallas(midx[s:s + seg], mask[s:s + seg],
                             gwin[s:s + seg], x2d, C)
             for s in range(0, nchunks, seg)])
    ng = max(_round_up(nchunks, C) // C, 1)
    padc = ng * C - nchunks
    if padc:
        midx = jnp.concatenate(
            [midx, jnp.zeros((padc, 8, _LANES), midx.dtype)])
        mask = jnp.concatenate(
            [mask, jnp.zeros((padc, 8, _LANES), mask.dtype)])
        gwin = jnp.concatenate([gwin, jnp.zeros((padc, 8), gwin.dtype)])
    kernel = _make_kernel(C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # x2d resident
            pl.BlockSpec((C, 8, _LANES), lambda g, a: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 8, _LANES), lambda g, a: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, _LANES), lambda g, a: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ng * C, _LANES), jnp.float32),
            grid_spec=grid_spec,
        )(gwin, x2d, midx, mask)
    return y[:nchunks]
