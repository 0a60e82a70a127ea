"""Fused brick-encode + NGP-MLP eval kernel (forward-only).

One Pallas program per 1024-point block computes the ENTIRE NGP field
evaluation — multi-level hash encode (the v2 lane-parallel geometry of
ops/pallas/eval_encode.py) followed by the small NeRF MLP — without the
features, hidden activations, or raw outputs ever leaving VMEM.

Why: the render-path profile (RESULTS_r03) showed the unfused eval
chain (Pallas encode -> XLA MLP/SH glue) running at ~33 ns/pt where the
encode alone costs 8.9 — over two thirds of the per-point wall was XLA
materialization/layout between stages. The MLP itself is tiny (the
hard_ngp head is D=3/W=64: ~37 kFLOP/pt, <1 ns on the MXU), so fusing
it into the encode block is nearly free and removes the glue entirely.
Covers the eval half of the reference CUDA encoder + torch MLP pair
(src/models/encoding/hashencoder/src/hashencoder.cu:78-197,
src/models/nerf/network.py:40-74) in a single TPU kernel.

Design notes:

* Flax's skip concat (``h = [x, h]`` after layer ``i in skips``) and the
  view concat (``[feature, sh]``) become SPLIT matmuls —
  ``x @ Wx + h @ Wh`` with the kernel rows of the following layer split
  at the concat boundary — so every VMEM tensor keeps a lane-clean
  (block, width) shape and Mosaic never relayouts a 88/80-lane array.
* MLP matmuls run in f32 at HIGHEST precision: the NGP configs set
  ``network.dtype: float32`` and the fused path must match the XLA MLP
  bit-for-bit-ish (bf16 table quantization is shared with the training
  kernel; the MLP is not quantized). The f32 cost is irrelevant at this
  size.
* Spherical-harmonics dir features are computed per RAY in XLA (16
  lanes, deg-4) and broadcast per point by the caller — the kernel
  takes them as a (block, 16) operand.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .eval_encode import _unpack_f0_f1, pack_eval_table
from .hashgrid_kernel import (
    ROW,
    BrickLayout,
    _interpret,
    compute_brick_ids,
)

_CP = pltpu.CompilerParams(dimension_semantics=("parallel",),
                           vmem_limit_bytes=110 * 2 ** 20)
_HI = jax.lax.Precision.HIGHEST


def extract_mlp_weights(mlp_params, n_feat: int, depth: int,
                        skips: tuple, view_depth: int):
    """Flax NeRFMLP params (one branch) -> flat operand list for the
    fused kernel, with skip/view concats pre-split at the boundary.

    Returns (ops, meta): ``ops`` is a tuple of f32 arrays in kernel
    order; ``meta`` a static description used to rebuild the ladder
    inside the kernel.
    """
    ops = []
    trunk = []
    for i in range(depth):
        k = jnp.asarray(mlp_params[f"pts_{i}"]["kernel"], jnp.float32)
        b = jnp.asarray(mlp_params[f"pts_{i}"]["bias"], jnp.float32)
        if i > 0 and (i - 1) in skips:
            # previous layer emitted concat([x, h]); split kernel rows
            ops += [k[:n_feat], k[n_feat:], b[None]]
            trunk.append("split")
        else:
            ops += [k, b[None]]
            trunk.append("plain")
    # a skip after the LAST trunk layer feeds concat([x, h]) straight
    # into the heads — alpha/feature kernels split the same way
    head_split = (depth - 1) in skips
    for name in ("alpha", "feature"):
        k = jnp.asarray(mlp_params[name]["kernel"], jnp.float32)
        b = jnp.asarray(mlp_params[name]["bias"], jnp.float32)[None]
        if head_split:
            ops += [k[:n_feat], k[n_feat:], b]
        else:
            ops += [k, b]
    assert view_depth == 1, "fused kernel supports view_depth == 1"
    kv = jnp.asarray(mlp_params["views_0"]["kernel"], jnp.float32)
    w = mlp_params["feature"]["kernel"].shape[1]
    ops += [kv[:w], kv[w:],
            jnp.asarray(mlp_params["views_0"]["bias"], jnp.float32)[None]]
    ops += [jnp.asarray(mlp_params["rgb"]["kernel"], jnp.float32),
            jnp.asarray(mlp_params["rgb"]["bias"], jnp.float32)[None]]
    return tuple(ops), (tuple(trunk), head_split)


def _fused_kernel(layout, blk, meta, mlp_bf16, combined_gather, *refs):
    (bidv_ref, pts_ref, sh_ref, tbf_ref, res_ref,
     *wrefs) = refs[:-1]
    out_ref = refs[-1]
    L = len(layout.scales)

    # ---- encode: v2 lane-parallel geometry (see eval_encode.py) ------
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1)
    dxv = (lane >> 2) & 1
    dyv = (lane >> 1) & 1
    dzv = lane & 1
    res = res_ref[0:1, :]
    valid = lane < (8 * L)
    fr = []
    loc = []
    for a in range(3):
        pos = pts_ref[:, a:a + 1] * res
        cell = jnp.clip(jnp.floor(pos), 0.0, jnp.maximum(res - 1.0, 0.0))
        fr.append(pos - cell)
        loc.append(cell.astype(jnp.int32) & (4 - 1))
    li = ((loc[0] + dxv) * 25 + (loc[1] + dyv) * 5 + (loc[2] + dzv))
    w = (jnp.where(dxv == 1, fr[0], 1.0 - fr[0])
         * jnp.where(dyv == 1, fr[1], 1.0 - fr[1])
         * jnp.where(dzv == 1, fr[2], 1.0 - fr[2]))
    w = jnp.where(valid, w, 0.0)
    # Corner extraction: per-level one-hot row fetch on the MXU, then
    # two take_along_axis lane gathers. Two gather-free reformulations
    # (compare-scattered trilinear weights + lane-reduce, and + one
    # block-diagonal selector matmul) both measured SLOWER (145/140 vs
    # 107 ns/pt): the gathers pipeline against the one-hot matmuls,
    # while compare-built weight vectors compete with the one-hot build
    # on the VPU. See RESULTS_r03.
    group = lane >> 3
    acc0 = jnp.zeros((blk, 128), jnp.float32)
    acc1 = jnp.zeros((blk, 128), jnp.float32)
    li2 = jnp.concatenate([li, li + 128], axis=1)     # (blk, 256)
    for l in range(L):
        o = layout.offsets[l]
        nl = layout.offsets[l + 1] - o
        r = jax.lax.broadcasted_iota(jnp.int32, (blk, nl), 1)
        oh = (r == (bidv_ref[:, l:l + 1] - o)).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            oh, tbf_ref[o:o + nl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if combined_gather:
            # ONE 256-lane dynamic gather per level instead of two
            # 128-lane ones: Mosaic's take_along_axis cost is call-
            # overhead dominated (~2 us per (1024,128) call; see the
            # RESULTS_r03 micro-probes), so halving the call count
            # beats halving the lanes.
            g = jnp.take_along_axis(rows, li2, axis=1)
            g0, g1 = g[:, :128], g[:, 128:]
        else:
            g0 = jnp.take_along_axis(rows[:, :128], li, axis=1)
            g1 = jnp.take_along_axis(rows[:, 128:], li, axis=1)
        sel = group == l
        acc0 = acc0 + jnp.where(sel, w * g0, 0.0)
        acc1 = acc1 + jnp.where(sel, w * g1, 0.0)
    s0_ref, s1_ref = wrefs[-2], wrefs[-1]
    wrefs = wrefs[:-2]
    x = (jnp.dot(acc0, s0_ref[...], preferred_element_type=jnp.float32)
         + jnp.dot(acc1, s1_ref[...], preferred_element_type=jnp.float32))

    # ---- MLP ladder (f32, split-matmul concats) ----------------------
    trunk, head_split = meta
    wi = iter(wrefs)
    if mlp_bf16:
        # bf16 inputs / f32 accumulate: ~bf16-mantissa noise on raw
        # outputs (same class as the table quantization); MXU-cheap
        nxt = lambda: next(wi)[...].astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(
            a.astype(jnp.bfloat16), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        nxt = lambda: next(wi)[...]
        dot = lambda a, b: jnp.dot(a, b, precision=_HI)
    h = x
    for kind in trunk:
        if kind == "split":
            kx, kh, b = nxt(), nxt(), nxt()
            h = dot(x, kx) \
                + dot(h, kh) + b
        else:
            k, b = nxt(), nxt()
            h = dot(h, k) + b
        h = jnp.maximum(h, 0.0)
        # Flax concats AFTER the relu of layer i; the split matmul of
        # the consumer (next layer or heads) takes (x, h) separately.
    if head_split:
        kax, kah, ba = nxt(), nxt(), nxt()
        sigma = dot(x, kax) \
            + dot(h, kah) + ba         # (blk, 1)
        kfx, kfh, bf = nxt(), nxt(), nxt()
        feat = dot(x, kfx) \
            + dot(h, kfh) + bf         # (blk, W)
    else:
        ka, ba = nxt(), nxt()
        sigma = dot(h, ka) + ba        # (blk, 1)
        kf, bf = nxt(), nxt()
        feat = dot(h, kf) + bf         # (blk, W)
    kvf, kvs, bv = nxt(), nxt(), nxt()
    hv = jnp.maximum(
        dot(feat, kvf)
        + dot(sh_ref[...], kvs) + bv, 0.0)
    kr, br = nxt(), nxt()
    rgb = dot(hv, kr) + br             # (blk, 3)
    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = sigma


@partial(jax.jit, static_argnums=(0, 1, 6, 7, 8))
def fused_ngp_eval(layout: BrickLayout, meta, packed_table, weight_ops,
                   x, sh=None, blk: int = 1024, mlp_bf16: bool = False,
                   combined_gather: bool = True):
    """x (N, 3) in [0,1], sh (N, n_sh) per-point dir features ->
    raw (N, 4) f32 ``[rgb_logits, sigma_raw]``.

    Requires every level's row count to fit the one-hot MXU strategy
    (all-mxu v2 layout, 8 * n_levels <= 128 lanes). ``weight_ops`` from
    :func:`extract_mlp_weights`.
    """
    L = len(layout.scales)
    n = x.shape[0]
    npad = -(-n // blk) * blk
    pts = jnp.zeros((npad, 8), jnp.float32).at[:n, :3].set(
        x.astype(jnp.float32))
    bid_local = compute_brick_ids(layout, pts[:, :3])
    offs = jnp.asarray(layout.offsets[:L], jnp.int32)
    ids = bid_local + offs[None, :]
    n_sh = weight_ops[-4].shape[0]
    if sh is None:
        shp = jnp.zeros((npad, n_sh), jnp.float32)
    else:
        shp = jnp.zeros((npad, n_sh), jnp.float32).at[:n].set(
            sh.astype(jnp.float32))

    f0, f1 = _unpack_f0_f1(packed_table)
    tbf = jnp.concatenate([f0, f1], axis=1).astype(jnp.bfloat16)
    res_lane = np.zeros((1, 128), np.float32)
    # lane-group selectors: (level, corner) lane 8l+c sums into
    # feature 2l (f0) / 2l+1 (f1)
    s0 = np.zeros((128, 2 * L), np.float32)
    s1 = np.zeros((128, 2 * L), np.float32)
    for l in range(L):
        res_lane[0, 8 * l:8 * l + 8] = layout.scales[l]
        s0[8 * l:8 * l + 8, 2 * l] = 1.0
        s1[8 * l:8 * l + 8, 2 * l + 1] = 1.0
    s0, s1 = jnp.asarray(s0), jnp.asarray(s1)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape))
    in_specs = [
        pl.BlockSpec((blk, L), lambda i: (i, 0)),
        pl.BlockSpec((blk, 8), lambda i: (i, 0)),
        pl.BlockSpec((blk, n_sh), lambda i: (i, 0)),
        full((layout.n_rows, ROW)),
        full((1, 128)),
    ] + [full(op.shape) for op in weight_ops] + [full(s0.shape),
                                                 full(s1.shape)]
    out = pl.pallas_call(
        partial(_fused_kernel, layout, blk, meta, mlp_bf16,
                combined_gather),
        grid=(npad // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk, 4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 4), jnp.float32),
        compiler_params=_CP,
        interpret=_interpret(),
    )(ids, pts, shp, tbf, jnp.asarray(res_lane), *weight_ops, s0, s1)
    return out[:n]
