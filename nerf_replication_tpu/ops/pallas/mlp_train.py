"""Differentiable fused NeRF-MLP: forward + backward Pallas kernels.

Round 2's fused MLP (mlp_kernel.py) was eval-only; the training step
ran the MLP layer-by-layer in XLA at ~57 TFLOP/s (HBM-bound on
activations). This module adds the backward as a second Pallas kernel
(VERDICT r2 task 6, the strong path): per tile it RECOMPUTES the
forward activations in VMEM (rematerialization — the residuals are just
the tile inputs, nothing is staged to HBM) and back-propagates through
the canonical architecture, accumulating weight gradients in VMEM
across grid steps. This is the TPU analog of the reference training
through its CUDA encoder both ways (hashencoder.cu:201-271) applied to
the MLP hot loop.

Numerics: matmuls run bf16 with f32 accumulation in BOTH directions, so
weight gradients carry bf16 quantization per tile (same deliberate
trade as the hash-grid mxu backward; tests tolerate ~5e-2 relative).
Input gradients (d pts_feat / d view_feat) are NOT produced — sample
positions and directions carry no gradient in NeRF training — so the
custom_vjp returns zeros for them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp_kernel import TILE_N, _LANE, _kernel, _pad_to

# the BACKWARD accumulates weight grads across blocks -> 'arbitrary';
# the forward has no cross-block state -> 'parallel' (pipelined DMAs)
_CP_BWD = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=110 * 2 ** 20)
_CP_FWD = pltpu.CompilerParams(dimension_semantics=("parallel",),
                               vmem_limit_bytes=110 * 2 ** 20)


def _weight_names(depth, skip):
    names = ["w0", "b0"]
    for i in range(1, depth):
        if i == skip + 1:
            names += [f"w{i}x", f"w{i}h"]
        else:
            names += [f"w{i}"]
        names += [f"b{i}"]
    names += ["w_af", "b_af", "wv_f", "wv_d", "bv", "w_rgb", "b_rgb"]
    return names


def _bwd_kernel(depth, skip, n_w, x_ref, v_ref, g_ref, *rest):
    """Recompute-forward + backprop for one tile; grad refs accumulate
    across grid steps (single-threaded grid: 'arbitrary' semantics)."""
    w = dict(zip(_weight_names(depth, skip), rest[:n_w]))
    grads = dict(zip(_weight_names(depth, skip), rest[n_w:]))

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in grads.values():
            r[...] = jnp.zeros_like(r)

    f32 = jnp.float32
    bf = jnp.bfloat16
    x = x_ref[...]
    v = v_ref[...]
    tile = x.shape[0]

    # ---- recompute forward, keeping every activation in registers/VMEM
    hs = []
    h = jnp.maximum(jnp.dot(x, w["w0"][...], preferred_element_type=f32)
                    + w["b0"][...], 0.0)
    hs.append(h)
    for i in range(1, depth):
        if i == skip + 1:
            acc = (jnp.dot(x, w[f"w{i}x"][...], preferred_element_type=f32)
                   + jnp.dot(h.astype(bf), w[f"w{i}h"][...],
                             preferred_element_type=f32))
        else:
            acc = jnp.dot(h.astype(bf), w[f"w{i}"][...],
                          preferred_element_type=f32)
        h = jnp.maximum(acc + w[f"b{i}"][...], 0.0)
        hs.append(h)
    af = jnp.dot(h.astype(bf), w["w_af"][...],
                 preferred_element_type=f32) + w["b_af"][...]
    feat = af[:, :256]
    g_act = jnp.maximum(
        jnp.dot(feat.astype(bf), w["wv_f"][...], preferred_element_type=f32)
        + jnp.dot(v, w["wv_d"][...], preferred_element_type=f32)
        + w["bv"][...], 0.0)

    # ---- backward
    gout = g_ref[...]                                # (tile, 128) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, gout.shape, 1)
    d_rgb = jnp.where(lane < 3, gout, 0.0)           # rgb grads, padded
    d_sigma = gout[:, 3:4]

    def acc_w(name, a, d):
        grads[name][...] = grads[name][...] + jax.lax.dot_general(
            a.astype(bf), d.astype(bf), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def acc_b(name, d):
        grads[name][...] = grads[name][...] + jnp.sum(d, axis=0,
                                                      keepdims=True)

    acc_w("w_rgb", g_act, d_rgb)
    acc_b("b_rgb", d_rgb)
    d_g = jax.lax.dot_general(                       # d_rgb @ w_rgb^T
        d_rgb.astype(bf), w["w_rgb"][...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    d_gpre = jnp.where(g_act > 0.0, d_g, 0.0)
    acc_w("wv_f", feat, d_gpre)
    acc_w("wv_d", v.astype(f32), d_gpre)
    acc_b("bv", d_gpre)
    d_feat = jax.lax.dot_general(
        d_gpre.astype(bf), w["wv_f"][...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    # d_af: cols 0..255 = d_feat, col 256 = d_sigma, rest zero
    d_af = jnp.concatenate(
        [d_feat, jnp.pad(d_sigma, ((0, 0), (0, _LANE - 1)))], axis=1)
    acc_w("w_af", hs[depth - 1], d_af)
    acc_b("b_af", d_af)
    d_h = jax.lax.dot_general(
        d_af.astype(bf), w["w_af"][...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    for i in range(depth - 1, 0, -1):
        d_pre = jnp.where(hs[i] > 0.0, d_h, 0.0)
        acc_b(f"b{i}", d_pre)
        if i == skip + 1:
            acc_w(f"w{i}x", x.astype(f32), d_pre)
            acc_w(f"w{i}h", hs[i - 1], d_pre)
            d_h = jax.lax.dot_general(
                d_pre.astype(bf), w[f"w{i}h"][...], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        else:
            acc_w(f"w{i}", hs[i - 1], d_pre)
            d_h = jax.lax.dot_general(
                d_pre.astype(bf), w[f"w{i}"][...], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
    d_pre0 = jnp.where(hs[0] > 0.0, d_h, 0.0)
    acc_w("w0", x.astype(f32), d_pre0)
    acc_b("b0", d_pre0)


def _interpret() -> bool:
    import os

    if os.environ.get("PALLAS_INTERPRET", "0") == "1":
        return True
    return jax.default_backend() != "tpu"


def _fwd_impl(meta, weights, x, v):
    in_pad, view_pad, depth, skip, tile_n = meta
    n = x.shape[0]
    n_full = -(-n // tile_n) * tile_n
    xp = _pad_to(x.astype(jnp.bfloat16), rows=n_full, cols=in_pad)
    vp = _pad_to(v.astype(jnp.bfloat16), rows=n_full, cols=view_pad)
    names = _weight_names(depth, skip)
    ws = [weights[k].astype(jnp.bfloat16)
          if weights[k].ndim == 2 and not k.startswith("b")
          else weights[k].astype(jnp.float32) for k in names]
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, depth, skip),
        grid=(n_full // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, view_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[full(wt) for wt in ws],
        ],
        out_specs=pl.BlockSpec((tile_n, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, _LANE), jnp.float32),
        compiler_params=_CP_FWD,
        interpret=_interpret(),
    )(xp, vp, *ws)
    return out[:n, :4]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_nerf_mlp_diff(meta, weights, pts_feat, view_feat):
    """Differentiable fused MLP.

    Args:
      meta: static (in_pad, view_pad, depth, skip, tile_n).
      weights: dict in pack_nerf_params layout (UNQUANTIZED f32 values;
        the kernels cast to bf16 internally).
      pts_feat (N, in_dim), view_feat (N, view_dim).
    Returns raw (N, 4) float32.
    """
    return _fwd_impl(meta, weights, pts_feat, view_feat)


def _diff_fwd(meta, weights, x, v):
    return _fwd_impl(meta, weights, x, v), (weights, x, v)


def _diff_bwd(meta, res, g):
    weights, x, v = res
    in_pad, view_pad, depth, skip, tile_n = meta
    n = x.shape[0]
    n_full = -(-n // tile_n) * tile_n
    xp = _pad_to(x.astype(jnp.bfloat16), rows=n_full, cols=in_pad)
    vp = _pad_to(v.astype(jnp.bfloat16), rows=n_full, cols=view_pad)
    gp = _pad_to(g.astype(jnp.float32), rows=n_full, cols=_LANE)
    names = _weight_names(depth, skip)
    ws = [weights[k].astype(jnp.bfloat16)
          if weights[k].ndim == 2 and not k.startswith("b")
          else weights[k].astype(jnp.float32) for k in names]
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct(weights[k].shape, jnp.float32)
                  for k in names]
    out_specs = [pl.BlockSpec(weights[k].shape,
                              (lambda nd: lambda i: (0,) * nd)(
                                  weights[k].ndim),
                              memory_space=pltpu.VMEM) for k in names]
    grads = pl.pallas_call(
        partial(_bwd_kernel, depth, skip, len(names)),
        grid=(n_full // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, view_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[full(wt) for wt in ws],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_CP_BWD,
        interpret=_interpret(),
    )(xp, vp, gp, *ws)
    dw = {k: gr.astype(weights[k].dtype) for k, gr in zip(names, grads)}
    return dw, jnp.zeros_like(x), jnp.zeros_like(v)


fused_nerf_mlp_diff.defvjp(_diff_fwd, _diff_bwd)


def pack_params_jnp(branch_params: dict, in_dim: int, view_dim: int,
                    depth: int = 8, skips=(4,)):
    """Differentiable (traced) pack of Flax branch params into the
    kernel layout — f32, no quantization; gradients flow back through
    the pads/slices to the original parameter tree."""
    skip = skips[0]
    in_pad = -(-in_dim // _LANE) * _LANE
    view_pad = -(-view_dim // _LANE) * _LANE
    w = lambda nm: branch_params[nm]["kernel"].astype(jnp.float32)
    b = lambda nm: branch_params[nm]["bias"].astype(jnp.float32)
    out = {"w0": _pad_to(w("pts_0"), rows=in_pad), "b0": b("pts_0")[None]}
    for i in range(1, depth):
        kern = w(f"pts_{i}")
        if i == skip + 1:
            out[f"w{i}x"] = _pad_to(kern[:in_dim], rows=in_pad)
            out[f"w{i}h"] = kern[in_dim:]
        else:
            out[f"w{i}"] = kern
        out[f"b{i}"] = b(f"pts_{i}")[None]
    out["w_af"] = _pad_to(
        jnp.concatenate([w("feature"), w("alpha")], axis=1), cols=3 * _LANE)
    out["b_af"] = _pad_to(
        jnp.concatenate([b("feature"), b("alpha")])[None], cols=3 * _LANE)
    wv = w("views_0")
    out["wv_f"] = wv[:256]
    out["wv_d"] = _pad_to(wv[256:], rows=view_pad)
    out["bv"] = b("views_0")[None]
    out["w_rgb"] = _pad_to(w("rgb"), cols=_LANE)
    out["b_rgb"] = _pad_to(b("rgb")[None], cols=_LANE)
    return out, (in_pad, view_pad, depth, skip)


def make_fused_train_apply(net, tile_n: int = TILE_N):
    """Training apply_fn(params, pts, viewdirs, model) routing the MLP
    through the differentiable fused kernels (encoders stay in XLA —
    they carry no parameters for the frequency flagship). Returns None
    when the architecture isn't canonical (width 256, one skip, one
    view layer, frequency/SH encoders with an output_dim)."""
    from ...models.encoding.freq import FrequencyEncoder

    for m in ("coarse", "fine"):
        mlp = getattr(net, m, None)
        if mlp is None or mlp.width != 256 or len(tuple(mlp.skips)) != 1 \
                or getattr(mlp, "view_depth", 1) != 1 \
                or not mlp.use_viewdirs:
            return None
    if not isinstance(net.xyz_encoder, FrequencyEncoder):
        return None
    depth = net.coarse.depth
    skips = tuple(net.coarse.skips)
    in_dim = net.xyz_encoder.output_dim
    view_dim = net.dir_encoder.output_dim

    def apply_fn(params, pts, viewdirs, model):
        shape = pts.shape[:-1]
        pts_flat = pts.reshape(-1, 3)
        dirs = jnp.broadcast_to(viewdirs, shape + (3,)).reshape(-1, 3)
        branch = "fine" if model == "fine" else "coarse"
        weights, (in_pad, view_pad, d, sk) = pack_params_jnp(
            params["params"][branch], in_dim, view_dim, depth=depth,
            skips=skips)
        meta = (in_pad, view_pad, d, sk, tile_n)
        raw = fused_nerf_mlp_diff(meta, weights,
                                  net.xyz_encoder(pts_flat),
                                  net.dir_encoder(dirs))
        return raw.reshape(*shape, 4)

    return apply_fn
