"""Eval-optimized bricked hash-grid encode (forward-only Pallas kernel).

The training kernel (hashgrid_kernel.py) fetches brick rows with one-hot
matmuls so its backward is a transposed matmul — that makes the forward
MXU-bound at ~16 MFLOP/pt (7.4 Mpts/s at log2_bricks=12). Rendering
needs no backward, so this kernel optimizes the fetch instead
(VERDICT r2 task 2; covers the eval half of the reference CUDA
encoder's duty, src/models/encoding/hashencoder/src/hashencoder.cu:78-197):

* The 256-lane bf16 brick row is bit-packed into 128 u32 lanes: lane v
  holds (bf16_bits(f0[v]) << 16) | bf16_bits(f1[v]). One row fetch is a
  (1, 128) dynamic sublane slice — 512 B, half the registers of the
  training layout's (1, 256) f32 row.
* Unpacking is pure VPU bit math (no relayout): a bf16 in the HIGH 16
  bits of a u32 IS a valid f32 after masking, so
  f0 = bitcast(row & 0xffff0000, f32), f1 = bitcast(row << 16, f32).
* Corner extraction/interpolation reuses the training kernel's lane
  gather + VPU reduction (hashgrid_kernel._level_geometry).
* Small dense levels can optionally ride the MXU (one-hot against a
  bf16 sub-table) so matrix and scalar units overlap (``mxu_max_rows``).

Numerics match the training forward (both quantize table values to
bf16 before interpolating; weights accumulate in f32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashgrid_kernel import (
    ROW,
    BrickLayout,
    _interpret,
    _level_geometry,
    compute_brick_ids,
)

# forward-only kernel, no cross-block state: 'parallel' lets Mosaic
# pipeline the per-block DMAs (an 'arbitrary' grid serializes them —
# measured ~5x slower on the dense render path)
_CP = pltpu.CompilerParams(dimension_semantics=("parallel",),
                           vmem_limit_bytes=110 * 2 ** 20)
_UNROLL = 8


def pack_eval_table(table: jnp.ndarray) -> jnp.ndarray:
    """(n_rows, 256) f32 training table -> (n_rows, 128) u32 packed
    bf16-pair rows (f0 high 16 bits, f1 low)."""
    f0 = jax.lax.bitcast_convert_type(
        table[:, :128].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    f1 = jax.lax.bitcast_convert_type(
        table[:, 128:].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return (f0 << 16) | f1


def _eval_strategies(layout: BrickLayout, mxu_max_rows: int):
    return tuple(
        "mxu" if layout.offsets[l + 1] - layout.offsets[l] <= mxu_max_rows
        else "scalar"
        for l in range(len(layout.scales)))


def _unpack_f0_f1(row_u32):
    hi = jax.lax.bitcast_convert_type(
        row_u32 & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = jax.lax.bitcast_convert_type(row_u32 << 16, jnp.float32)
    return hi, lo


def _eval_kernel(layout, blk, strategies, *refs):
    any_mxu = "mxu" in strategies
    if any_mxu:
        ids_smem, bidv_ref, pts_ref, tp_ref, tbf_ref, out_ref, buf_ref = refs
    else:
        ids_smem, pts_ref, tp_ref, out_ref, buf_ref = refs
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1)
    px = pts_ref[:, 0:1]
    py = pts_ref[:, 1:2]
    pz = pts_ref[:, 2:3]
    for l, res in enumerate(layout.scales):
        o = layout.offsets[l]
        nl = layout.offsets[l + 1] - o
        li, w = _level_geometry(px, py, pz, res, lane)
        if strategies[l] == "mxu":
            r = jax.lax.broadcasted_iota(jnp.int32, (blk, nl), 1)
            oh = (r == (bidv_ref[:, l:l + 1] - o)).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                oh, tbf_ref[o:o + nl, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            f0 = rows[:, :128]
            f1 = rows[:, 128:]
        else:
            def copy(i, _):
                base = i * _UNROLL
                for u in range(_UNROLL):
                    buf_ref[pl.ds(base + u, 1), :] = \
                        tp_ref[pl.ds(ids_smem[l, base + u], 1), :]
                return 0
            jax.lax.fori_loop(0, blk // _UNROLL, copy, 0)
            f0, f1 = _unpack_f0_f1(buf_ref[:])
        g0 = jnp.take_along_axis(f0, li, axis=1)
        g1 = jnp.take_along_axis(f1, li, axis=1)
        out_ref[:, 2 * l:2 * l + 1] = jnp.sum(w * g0, axis=1, keepdims=True)
        out_ref[:, 2 * l + 1:2 * l + 2] = jnp.sum(w * g1, axis=1,
                                                  keepdims=True)


def _eval_kernel_v2(layout, blk, bidv_ref, pts_ref, tbf_ref, res_ref,
                    s0_ref, s1_ref, out_ref):
    """All-MXU fast path with LANE-PARALLEL geometry: lane = level*8 +
    corner (L*8 <= 128), so the trilinear corner indices/weights for
    EVERY level come out of ONE set of (B, 128) VPU ops instead of a
    per-level pass — the per-level work shrinks to the one-hot row
    fetch (MXU) and the corner gather."""
    L = len(layout.scales)
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1)
    group = lane >> 3
    dxv = (lane >> 2) & 1
    dyv = (lane >> 1) & 1
    dzv = lane & 1
    res = res_ref[0:1, :]                              # (1, 128) f32
    valid = lane < (8 * L)

    fr = []
    loc = []
    for a in range(3):
        pos = pts_ref[:, a:a + 1] * res                # (B, 128)
        cell = jnp.clip(jnp.floor(pos), 0.0, jnp.maximum(res - 1.0, 0.0))
        fr.append(pos - cell)
        loc.append(cell.astype(jnp.int32) & (4 - 1))
    li = ((loc[0] + dxv) * 25 + (loc[1] + dyv) * 5 + (loc[2] + dzv))
    w = (jnp.where(dxv == 1, fr[0], 1.0 - fr[0])
         * jnp.where(dyv == 1, fr[1], 1.0 - fr[1])
         * jnp.where(dzv == 1, fr[2], 1.0 - fr[2]))
    w = jnp.where(valid, w, 0.0)

    acc0 = jnp.zeros((blk, 128), jnp.float32)
    acc1 = jnp.zeros((blk, 128), jnp.float32)
    for l in range(L):
        o = layout.offsets[l]
        nl = layout.offsets[l + 1] - o
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, nl), 1)
        oh = (r == (bidv_ref[:, l:l + 1] - o)).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            oh, tbf_ref[o:o + nl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (B, 256)
        g0 = jnp.take_along_axis(rows[:, :128], li, axis=1)
        g1 = jnp.take_along_axis(rows[:, 128:], li, axis=1)
        sel = group == l
        acc0 = acc0 + jnp.where(sel, w * g0, 0.0)
        acc1 = acc1 + jnp.where(sel, w * g1, 0.0)
    # per-level lane-group sums via two small matmuls: s0/s1 are
    # (128, 2L) selectors (s0[lane, 2*(lane>>3)] = 1, s1 odd columns)
    out_ref[...] = (
        jnp.dot(acc0, s0_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(acc1, s1_ref[...], preferred_element_type=jnp.float32))


@partial(jax.jit, static_argnums=(0, 3, 4))
def brick_encode_eval(layout: BrickLayout, packed_table, x,
                      mxu_max_rows: int = 0, blk: int = 1024):
    """x (N, 3) in [0,1], packed_table (n_rows, 128) u32 (see
    :func:`pack_eval_table`) -> (N, 2L) f32 features.

    Forward-only (no vjp): the render path never differentiates through
    the encoder. ``mxu_max_rows`` routes levels with at most that many
    table rows through the one-hot MXU strategy.
    """
    L = len(layout.scales)
    n = x.shape[0]
    # the scalar-strategy row copy runs in _UNROLL-row groups; a blk
    # that is not a multiple would silently skip the tail rows and
    # interpolate uninitialized VMEM scratch (blk is BENCH_BLK-settable)
    if blk % _UNROLL != 0:
        raise ValueError(f"blk={blk} must be a multiple of {_UNROLL}")
    strategies = _eval_strategies(layout, mxu_max_rows)
    any_mxu = "mxu" in strategies
    npad = -(-n // blk) * blk
    pts = jnp.zeros((npad, 8), jnp.float32).at[:n, :3].set(
        x.astype(jnp.float32))
    bid_local = compute_brick_ids(layout, pts[:, :3])
    offs = jnp.asarray(layout.offsets[:L], jnp.int32)
    ids = bid_local + offs[None, :]

    if all(st == "mxu" for st in strategies) and 8 * L <= 128:
        # v2 lane-parallel fast path
        f0, f1 = _unpack_f0_f1(packed_table)
        tbf = jnp.concatenate([f0, f1], axis=1).astype(jnp.bfloat16)
        res_lane = np.zeros((1, 128), np.float32)
        s0 = np.zeros((128, 2 * L), np.float32)
        s1 = np.zeros((128, 2 * L), np.float32)
        for l in range(L):
            res_lane[0, 8 * l:8 * l + 8] = layout.scales[l]
            s0[8 * l:8 * l + 8, 2 * l] = 1.0
            s1[8 * l:8 * l + 8, 2 * l + 1] = 1.0
        out = pl.pallas_call(
            partial(_eval_kernel_v2, layout, blk),
            grid=(npad // blk,),
            in_specs=[
                pl.BlockSpec((blk, L), lambda i: (i, 0)),
                pl.BlockSpec((blk, 8), lambda i: (i, 0)),
                pl.BlockSpec((layout.n_rows, ROW), lambda i: (0, 0)),
                pl.BlockSpec((1, 128), lambda i: (0, 0)),
                pl.BlockSpec((128, 2 * L), lambda i: (0, 0)),
                pl.BlockSpec((128, 2 * L), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((blk, 2 * L), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((npad, 2 * L), jnp.float32),
            compiler_params=_CP,
            interpret=_interpret(),
        )(ids, pts, tbf, jnp.asarray(res_lane), jnp.asarray(s0),
          jnp.asarray(s1))
        return out[:n]
    # SMEM copy transposed to (L, blk): SMEM windows pad the LAST dim to
    # lanes, so (blk, L) would blow the ~1 MB SMEM budget at blk=1024
    ids_t = ids.T

    in_specs = [pl.BlockSpec((L, blk), lambda i: (0, i),
                             memory_space=pltpu.SMEM)]
    args = [ids_t]
    if any_mxu:
        in_specs.append(pl.BlockSpec((blk, L), lambda i: (i, 0)))
        args.append(ids)
    in_specs.append(pl.BlockSpec((blk, 8), lambda i: (i, 0)))
    args.append(pts)
    in_specs.append(pl.BlockSpec((layout.n_rows, 128), lambda i: (0, 0)))
    args.append(packed_table)
    if any_mxu:
        # bf16 256-lane sub-table for the one-hot levels (first rows)
        mxu_end = 0
        for l in range(L):
            if strategies[l] == "mxu":
                mxu_end = max(mxu_end, layout.offsets[l + 1])
        f0, f1 = _unpack_f0_f1(packed_table[:mxu_end])
        tbf = jnp.concatenate([f0, f1], axis=1).astype(jnp.bfloat16)
        in_specs.append(pl.BlockSpec((mxu_end, ROW), lambda i: (0, 0)))
        args.append(tbf)

    out = pl.pallas_call(
        partial(_eval_kernel, layout, blk, strategies),
        grid=(npad // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk, 2 * L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 2 * L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((blk, 128), jnp.uint32)],
        compiler_params=_CP,
        interpret=_interpret(),
    )(*args)
    return out[:n]
