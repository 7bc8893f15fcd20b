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
chunk is: build the window rows (dynamic VMEM row loads), ONE
take_along_axis per 8-window tile (each sublane gathers from its own
window), mask-multiply, and a sublane sum.  No K-pass select loop,
~13 VPU ops / 128 outputs.

Chunks whose targets span more than 8 distinct 128-blocks of x are
covered by a SECOND window tile (16 windows, two gather passes) when the
8-window spill rate exceeds 0.3% — the XLA scatter fallback costs
~15 ns/element, ~90 us at the 2-3% spill rate of fine cluster layouts.
Remaining outputs spill to the scatter tail.  idx < 0 yields 0.0.

Reference role: Tpetra Import plan execution (the gather half);
SURVEY.md §2.9 halo exchange backend.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _build_plan(idx: np.ndarray, n_win: int):
    """(midx [nchunks, n_win, 128] i16, mask [...] f32, gwin [nchunks,
    n_win] i32, spill_positions) for keeping each chunk's top-n_win
    blocks."""
    N = len(idx)
    nchunks = max(_round_up(N, _LANES) // _LANES, 1)
    lane = np.arange(N) % _LANES
    chunk = np.arange(N) // _LANES
    valid = idx >= 0
    blk = np.where(valid, idx // _LANES, 0)

    keys = (chunk * (1 << 32) + blk)[valid]
    uk, inv, counts = np.unique(keys, return_inverse=True,
                                return_counts=True)
    uc = (uk >> 32).astype(np.int64)
    ub = (uk & 0xFFFFFFFF).astype(np.int64)
    order = np.lexsort((-counts, uc))
    rank = np.empty(len(uk), np.int64)
    starts = np.searchsorted(uc[order], np.arange(nchunks))
    rank[order] = np.arange(len(uk)) - starts[uc[order]]
    kept_blk = rank < n_win
    gwin = np.zeros((nchunks, n_win), np.int32)
    gwin[uc[kept_blk], rank[kept_blk]] = ub[kept_blk].astype(np.int32)

    sub_v = rank[inv]
    ok_v = sub_v < n_win
    v_pos = np.flatnonzero(valid)
    ok_pos = v_pos[ok_v]

    midx = np.zeros((nchunks, n_win, _LANES), np.int16)
    mask = np.zeros((nchunks, n_win, _LANES), np.float32)
    midx[chunk[ok_pos], sub_v[ok_v], lane[ok_pos]] = \
        (idx[ok_pos] % _LANES).astype(np.int16)
    mask[chunk[ok_pos], sub_v[ok_v], lane[ok_pos]] = 1.0
    return midx, mask, gwin, v_pos[~ok_v], nchunks


class PermutationGather:
    """Static plan for y = x[idx] (idx int64 [N_out], -1 -> 0)."""

    def __init__(self, idx: np.ndarray, n_in: int, n_win: int = 0):
        idx = np.asarray(idx, dtype=np.int64)
        self.n_out = len(idx)
        self.n_in = n_in
        if n_win == 0:
            midx, mask, gwin, sp, nchunks = _build_plan(idx, 8)
            if len(sp) > 0.003 * max(self.n_out, 1):
                midx, mask, gwin, sp, nchunks = _build_plan(idx, 16)
                n_win = 16
            else:
                n_win = 8
        else:
            midx, mask, gwin, sp, nchunks = _build_plan(idx, n_win)
        self.n_win = n_win
        self.nchunks = nchunks
        self.n_spill = len(sp)
        self.spill_out = (jnp.asarray(sp.astype(np.int32))
                          if len(sp) else None)
        self.spill_src = (jnp.asarray(idx[sp].astype(np.int32))
                          if len(sp) else None)
        self.midx = jnp.asarray(midx)
        self.mask = jnp.asarray(mask)
        self.gwin = jnp.asarray(gwin)

    def operands(self):
        return (self.midx, self.mask, self.gwin, self.spill_out,
                self.spill_src)

    def operator(self):
        """(pure_fn, operands); fn(ops, x [n_in]) -> y [n_out].  Closes
        over static layout only (memoized per layout for solver program
        caching)."""
        key = (self.n_out, self.n_in, self.nchunks, self.n_win)
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
    # x rides VMEM-resident in the kernel (same budget as the SELL SpMV's
    # x2d, la/sell.py: per-device vectors up to ~2M f32 entries); beyond
    # ~3M entries fall back to the XLA path instead of failing Mosaic
    # allocation
    if n_in > 3_000_000:
        use_pallas = False
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
    win = x2d[gwin]                                # [nchunks, n_win, 128]
    g = jnp.take_along_axis(win, midx.astype(jnp.int32), axis=2)
    return (mask.astype(x2d.dtype) * g).sum(axis=1)  # [nchunks, 128]


def _make_kernel(C, n_win):
    n_tiles = n_win // 8

    def kernel(gwin_ref, x_ref, midx_ref, mask_ref, out_ref):
        g = pl.program_id(0)
        ones = jnp.ones((1, 8), jnp.float32)
        acc = None
        for t in range(n_tiles):
            rows = []
            for c in range(C):
                win = jnp.concatenate(
                    [jnp.broadcast_to(x_ref[gwin_ref[g * C + c, t * 8 + s]],
                                      (1, _LANES)) for s in range(8)],
                    axis=0)
                rows.append(win)
            src = jnp.concatenate(rows, axis=0)    # [C*8, 128]
            m_idx = midx_ref[:, t * 8:(t + 1) * 8].reshape(
                C * 8, _LANES).astype(jnp.int32)
            gk = jnp.take_along_axis(src, m_idx, axis=1)
            contrib = (mask_ref[:, t * 8:(t + 1) * 8].reshape(C * 8, _LANES)
                       * gk).reshape(C, 8, _LANES)
            y = jax.lax.dot_general(
                ones, contrib, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [1, C, 128]
            acc = y[0] if acc is None else acc + y[0]
        out_ref[:] = acc

    return kernel


def _permute_pallas(midx, mask, gwin, x2d, C=32):
    nchunks, n_win = midx.shape[0], midx.shape[1]
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
            [midx, jnp.zeros((padc, n_win, _LANES), midx.dtype)])
        mask = jnp.concatenate(
            [mask, jnp.zeros((padc, n_win, _LANES), mask.dtype)])
        gwin = jnp.concatenate([gwin,
                                jnp.zeros((padc, n_win), gwin.dtype)])
    kernel = _make_kernel(C, n_win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # x2d resident
            pl.BlockSpec((C, n_win, _LANES), lambda g, a: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, n_win, _LANES), lambda g, a: (g, 0, 0),
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
