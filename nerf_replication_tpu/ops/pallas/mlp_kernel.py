"""Fused NeRF-MLP forward as a Pallas TPU kernel.

The render hot loop evaluates the 8x256 MLP on up to ~123M points per
800x800 frame. Layer-by-layer XLA execution writes each (N, 256)
activation to HBM (~0.5 GB per layer per 1M points) — the pipeline is
HBM-bandwidth-bound. This kernel tiles N into VMEM blocks and runs ALL
layers per block (weights stay resident in VMEM, ~1.2 MB bf16), so HBM
traffic is just inputs + the (N, 4) output: compute-bound on the MXU.

Covers the reference architecture exactly (src/models/nerf/network.py
NeRF 9-75): depth-8 width-256 trunk, skip concat of the encoded input
at layer 4 (expressed as a split matmul — no concat in-kernel), density
head, feature layer, one 128-wide view-conditioned layer, RGB head.
Eval-path only (backward runs through the XLA path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 1024
_LANE = 128


def _pad_to(x, rows=None, cols=None):
    r = 0 if rows is None else rows - x.shape[0]
    c = 0 if cols is None else cols - x.shape[1]
    return jnp.pad(x, ((0, r), (0, c)))


def pack_nerf_params(branch_params: dict, in_dim: int, view_dim: int,
                     width: int = 256, depth: int = 8, skips=(4,),
                     dtype=jnp.bfloat16) -> dict:
    """Flax NeRFMLP params (one branch) -> padded bf16 weight stack.

    Only the canonical architecture (W=256, V_D=1, one skip) is
    supported; callers fall back to the XLA path otherwise.
    """
    assert width == 256 and len(skips) == 1, "fused kernel: canonical arch only"
    skip = skips[0]
    in_pad = -(-in_dim // _LANE) * _LANE
    view_pad = -(-view_dim // _LANE) * _LANE

    def w(name):
        return branch_params[name]["kernel"].astype(jnp.float32)

    def b(name):
        return branch_params[name]["bias"].astype(jnp.float32)

    packed = {
        "w0": _pad_to(w("pts_0"), rows=in_pad).astype(dtype),
        "b0": b("pts_0")[None, :],
    }
    for i in range(1, depth):
        kern = w(f"pts_{i}")
        if i == skip + 1:
            # layer after the skip concat sees [x, h] (network.py:53-57 —
            # encoded input first); split into x- and h- halves
            packed[f"w{i}x"] = _pad_to(kern[:in_dim], rows=in_pad).astype(dtype)
            packed[f"w{i}h"] = kern[in_dim:].astype(dtype)
        else:
            packed[f"w{i}"] = kern.astype(dtype)
        packed[f"b{i}"] = b(f"pts_{i}")[None, :]

    # fused heads: feature (256) + alpha (1) in one (256, 384) matmul
    w_af = jnp.concatenate([w("feature"), w("alpha")], axis=1)  # (256, 257)
    packed["w_af"] = _pad_to(w_af, cols=3 * _LANE).astype(dtype)
    packed["b_af"] = _pad_to(
        jnp.concatenate([b("feature"), b("alpha")])[None, :], cols=3 * _LANE)

    # view layer sees [feature, view_feat] (network.py:58-66)
    wv = w("views_0")
    packed["wv_f"] = wv[:width].astype(dtype)                        # (256,128)
    packed["wv_d"] = _pad_to(wv[width:], rows=view_pad).astype(dtype)
    packed["bv"] = b("views_0")[None, :]
    packed["w_rgb"] = _pad_to(w("rgb"), cols=_LANE).astype(dtype)    # (128,128)
    packed["b_rgb"] = _pad_to(b("rgb")[None, :], cols=_LANE)
    packed["_meta"] = np.array([in_pad, view_pad, depth, skip])
    return packed


def _kernel(depth, skip, x_ref, v_ref, *rest):
    # rest: per-layer weights..., then w_af, b_af, wv_f, wv_d, bv, w_rgb,
    # b_rgb, out_ref
    _kernel_body(depth, skip, x_ref[...], v_ref[...], *rest)


def fused_nerf_mlp(packed: dict, pts_feat: jnp.ndarray,
                   view_feat: jnp.ndarray, tile_n: int = TILE_N,
                   interpret: bool | None = None):
    """(N, in_dim), (N, view_dim) -> raw (N, 4) float32.

    N is padded to a tile multiple internally. ``interpret`` (or env
    PALLAS_INTERPRET=1) runs the kernel in the Pallas interpreter so the
    TPU kernel logic is testable on CPU.
    """
    import os

    if interpret is None:
        interpret = os.environ.get("PALLAS_INTERPRET", "0") == "1"
    meta = packed["_meta"]
    in_pad, view_pad, depth, skip = (int(m) for m in meta)
    n = pts_feat.shape[0]
    n_full = -(-n // tile_n) * tile_n

    x = _pad_to(pts_feat.astype(jnp.bfloat16), rows=n_full, cols=in_pad)
    v = _pad_to(view_feat.astype(jnp.bfloat16), rows=n_full, cols=view_pad)

    weight_names = ["w0", "b0"]
    for i in range(1, depth):
        if i == skip + 1:
            weight_names += [f"w{i}x", f"w{i}h"]
        else:
            weight_names += [f"w{i}"]
        weight_names += [f"b{i}"]
    weight_names += ["w_af", "b_af", "wv_f", "wv_d", "bv", "w_rgb", "b_rgb"]
    weights = [packed[k] for k in weight_names]

    grid = (n_full // tile_n,)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, depth, skip),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, view_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[full(wt) for wt in weights],
        ],
        out_specs=pl.BlockSpec((tile_n, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, _LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_full * (in_pad * 256 + 6 * 256 * 256 +
                                (in_pad + 256) * 256 + 256 * 384 +
                                (256 + view_pad) * 128 + 128 * 128),
            bytes_accessed=n_full * (in_pad + view_pad) * 2 + n_full * 512,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, v, *weights)
    return out[:n, :4]


def _freq_cols(x, n_freqs):
    """In-kernel NeRF positional encoding, matching freq_encode's layout
    exactly: [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{F-1} x), cos(...)]
    over all dims per band (models/encoding/freq.py:23-33)."""
    feats = [x]
    for i in range(n_freqs):
        xb = x * (2.0 ** i)
        feats.append(jnp.sin(xb))
        feats.append(jnp.cos(xb))
    return jnp.concatenate(feats, axis=-1)


def _kernel_enc(depth, skip, xyz_freqs, view_freqs, in_dim, view_dim,
                p_ref, d_ref, *rest):
    """Variant of _kernel that ENCODES inside the kernel: inputs are raw
    (TILE, 3) points/dirs; the positional encoding runs on the VPU and
    never round-trips HBM (saves the separate XLA encode pass — measured
    ~24 ms per 2.56M-point chunk — plus 30x of input traffic)."""
    in_pad = -(-in_dim // _LANE) * _LANE
    view_pad = -(-view_dim // _LANE) * _LANE
    x = jnp.pad(_freq_cols(p_ref[...], xyz_freqs),
                ((0, 0), (0, in_pad - in_dim))).astype(jnp.bfloat16)
    v = jnp.pad(_freq_cols(d_ref[...], view_freqs),
                ((0, 0), (0, view_pad - view_dim))).astype(jnp.bfloat16)
    _kernel_body(depth, skip, x, v, *rest)


def _kernel_body(depth, skip, x, v, w0, b0, *rest):
    out_ref = rest[-1]
    names = []
    for i in range(1, depth):
        if i == skip + 1:
            names += [f"w{i}x", f"w{i}h"]
        else:
            names += [f"w{i}"]
        names += [f"b{i}"]
    names += ["w_af", "b_af", "wv_f", "wv_d", "bv", "w_rgb", "b_rgb"]
    refs = dict(zip(names, rest[:-1]))

    f32 = jnp.float32
    h = jnp.maximum(
        jnp.dot(x, w0[...], preferred_element_type=f32) + b0[...], 0.0)
    for i in range(1, depth):
        if i == skip + 1:
            acc = (jnp.dot(x, refs[f"w{i}x"][...], preferred_element_type=f32)
                   + jnp.dot(h.astype(x.dtype), refs[f"w{i}h"][...],
                             preferred_element_type=f32))
        else:
            acc = jnp.dot(h.astype(x.dtype), refs[f"w{i}"][...],
                          preferred_element_type=f32)
        h = jnp.maximum(acc + refs[f"b{i}"][...], 0.0)

    af = jnp.dot(h.astype(x.dtype), refs["w_af"][...],
                 preferred_element_type=f32) + refs["b_af"][...]
    feat = af[:, :256]
    sigma = af[:, 256:257]
    g = jnp.maximum(
        jnp.dot(feat.astype(x.dtype), refs["wv_f"][...],
                preferred_element_type=f32)
        + jnp.dot(v, refs["wv_d"][...], preferred_element_type=f32)
        + refs["bv"][...], 0.0)
    rgb = jnp.dot(g.astype(x.dtype), refs["w_rgb"][...],
                  preferred_element_type=f32) + refs["b_rgb"][...]
    out = jnp.concatenate([rgb[:, :3], sigma], axis=1)       # (TILE, 4)
    out_ref[...] = jnp.pad(out, ((0, 0), (0, out_ref.shape[1] - 4)))


def fused_nerf_mlp_enc(packed: dict, pts: jnp.ndarray, dirs: jnp.ndarray,
                       xyz_freqs: int, view_freqs: int,
                       tile_n: int = 2048, interpret: bool | None = None):
    """Raw (N, 3) points + (N, 3) dirs -> raw (N, 4) float32, encoding +
    all MLP layers fused in one kernel pass."""
    import os

    if interpret is None:
        interpret = os.environ.get("PALLAS_INTERPRET", "0") == "1"
    meta = packed["_meta"]
    in_pad, view_pad, depth, skip = (int(m) for m in meta)
    in_dim = 3 * (1 + 2 * xyz_freqs)
    view_dim = 3 * (1 + 2 * view_freqs)
    n = pts.shape[0]
    n_full = -(-n // tile_n) * tile_n

    p = _pad_to(pts.astype(jnp.float32), rows=n_full)
    d = _pad_to(dirs.astype(jnp.float32), rows=n_full)

    weight_names = ["w0", "b0"]
    for i in range(1, depth):
        if i == skip + 1:
            weight_names += [f"w{i}x", f"w{i}h"]
        else:
            weight_names += [f"w{i}"]
        weight_names += [f"b{i}"]
    weight_names += ["w_af", "b_af", "wv_f", "wv_d", "bv", "w_rgb", "b_rgb"]
    weights = [packed[k] for k in weight_names]

    OUT_W = 8
    grid = (n_full // tile_n,)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel_enc, depth, skip, xyz_freqs, view_freqs,
                in_dim, view_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[full(wt) for wt in weights],
        ],
        out_specs=pl.BlockSpec((tile_n, OUT_W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, OUT_W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_full * (in_pad * 256 + 6 * 256 * 256 +
                                (in_pad + 256) * 256 + 256 * 384 +
                                (256 + view_pad) * 128 + 128 * 128),
            bytes_accessed=n_full * 6 * 4 + n_full * OUT_W * 4,
            transcendentals=n_full * (in_dim + view_dim - 6),
        ),
        interpret=interpret,
    )(p, d, *weights)
    return out[:n, :4]


def fused_nerf_mlp_enc_t(packed: dict, pts_t: jnp.ndarray,
                         dirs_t: jnp.ndarray, xyz_freqs: int,
                         view_freqs: int, tile_n: int = 2048,
                         interpret: bool | None = None):
    """Transposed-layout fused encode+MLP: (3, N) points/dirs ->
    (N, 4) float32 raw. Lane-dense I/O on every operand."""
    import os

    if interpret is None:
        interpret = os.environ.get("PALLAS_INTERPRET", "0") == "1"
    depth, skip = int(packed["_meta"][2]), int(packed["_meta"][3])
    n = pts_t.shape[1]
    n_full = -(-n // tile_n) * tile_n

    p = jnp.pad(pts_t.astype(jnp.float32), ((0, 0), (0, n_full - n)))
    d = jnp.pad(dirs_t.astype(jnp.float32), ((0, 0), (0, n_full - n)))

    weight_names = ["w0t", "b0"]
    for i in range(1, depth):
        if i == skip + 1:
            weight_names += [f"w{i}xt", f"w{i}h"]
        else:
            weight_names += [f"w{i}"]
        weight_names += [f"b{i}"]
    weight_names += ["w_af", "b_af", "wv_f", "wv_dt", "bv", "w_rgb",
                     "b_rgb"]
    weights = [packed[k] for k in weight_names]

    in_dim = 3 * (1 + 2 * xyz_freqs)
    view_dim = 3 * (1 + 2 * view_freqs)

    def kernel(p_ref, d_ref, *rest):
        out_ref = rest[-1]
        wrefs = dict(zip(weight_names, rest[:-1]))

        def feat_t(x3, n_freqs, rows):
            planes = [x3]
            for i in range(n_freqs):
                xb = x3 * (2.0 ** i)
                planes.append(jnp.sin(xb))
                planes.append(jnp.cos(xb))
            ft = jnp.concatenate(planes, axis=0)
            pad = rows - ft.shape[0]
            if pad:
                ft = jnp.pad(ft, ((0, pad), (0, 0)))
            return ft.astype(jnp.bfloat16)

        xT = feat_t(p_ref[...], xyz_freqs, wrefs["w0t"].shape[0])
        vT = feat_t(d_ref[...], view_freqs, wrefs["wv_dt"].shape[0])

        f32 = jnp.float32
        dn_t = (((0,), (0,)), ((), ()))
        h = jnp.maximum(
            jax.lax.dot_general(xT, wrefs["w0t"][...], dn_t,
                                preferred_element_type=f32)
            + wrefs["b0"][...], 0.0)
        for i in range(1, depth):
            if i == skip + 1:
                acc = (jax.lax.dot_general(
                    xT, wrefs[f"w{i}xt"][...], dn_t,
                    preferred_element_type=f32)
                    + jnp.dot(h.astype(jnp.bfloat16), wrefs[f"w{i}h"][...],
                              preferred_element_type=f32))
            else:
                acc = jnp.dot(h.astype(jnp.bfloat16), wrefs[f"w{i}"][...],
                              preferred_element_type=f32)
            h = jnp.maximum(acc + wrefs[f"b{i}"][...], 0.0)

        af = jnp.dot(h.astype(jnp.bfloat16), wrefs["w_af"][...],
                     preferred_element_type=f32) + wrefs["b_af"][...]
        feat = af[:, :256]
        sigma = af[:, 256:257]
        g = jnp.maximum(
            jnp.dot(feat.astype(jnp.bfloat16), wrefs["wv_f"][...],
                    preferred_element_type=f32)
            + jax.lax.dot_general(vT, wrefs["wv_dt"][...], dn_t,
                                  preferred_element_type=f32)
            + wrefs["bv"][...], 0.0)
        rgb = jnp.dot(g.astype(jnp.bfloat16), wrefs["w_rgb"][...],
                      preferred_element_type=f32) + wrefs["b_rgb"][...]
        out = jnp.concatenate([rgb[:, :3], sigma], axis=1)
        out_ref[...] = jnp.pad(out, ((0, 0), (0, out_ref.shape[1] - 4)))

    OUT_W = _LANE
    grid = (n_full // tile_n,)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[full(wt) for wt in weights],
        ],
        out_specs=pl.BlockSpec((tile_n, OUT_W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_full, OUT_W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_full * (64 * 256 + 6 * 256 * 256 +
                                (64 + 256) * 256 + 256 * 384 +
                                (256 + 32) * 128 + 128 * 128),
            bytes_accessed=n_full * 6 * 4 + n_full * OUT_W * 4,
            transcendentals=n_full * (in_dim + view_dim - 6),
        ),
        interpret=interpret,
    )(p, d, *weights)
    return out[:n, :4]


def pack_nerf_params_t(branch_params: dict, in_dim: int, view_dim: int,
                       width: int = 256, depth: int = 8, skips=(4,),
                       dtype=jnp.bfloat16) -> dict:
    """Weight pack for the transposed enc kernel: feature-indexed rows
    pad to the SUBLANE granularity (8), not the lane granularity (128)
    — the transposed-lhs matmuls contract over sublanes, so in_dim 63
    costs a 64-row matmul instead of 128."""
    base = pack_nerf_params(branch_params, in_dim, view_dim, width=width,
                            depth=depth, skips=skips, dtype=dtype)
    skip = skips[0]
    row8 = lambda d: -(-d // 8) * 8

    def w(name):
        return branch_params[name]["kernel"].astype(jnp.float32)

    base["w0t"] = _pad_to(w("pts_0"), rows=row8(in_dim)).astype(dtype)
    base[f"w{skip + 1}xt"] = _pad_to(
        w(f"pts_{skip + 1}")[:in_dim], rows=row8(in_dim)).astype(dtype)
    base["wv_dt"] = _pad_to(w("views_0")[width:],
                            rows=row8(view_dim)).astype(dtype)
    return base


def make_fused_apply(net, params):
    """Build an eval apply_fn(params_ignored, pts, viewdirs, model) that
    routes the MLP through the Pallas kernel (encoders run in XLA).
    Returns None when the architecture is not the canonical one."""
    mlps = {m: params["params"].get(m) for m in ("coarse", "fine")}
    if any(v is None for v in mlps.values()):
        return None
    # the kernel covers exactly the canonical reference architecture:
    # width 256, ONE skip concat, ONE view-conditioned layer. Anything
    # else (e.g. V_D: 2 adds views_1, which packing would silently drop)
    # must fall back to the XLA path.
    for m in ("coarse", "fine"):
        mlp = getattr(net, m, None)
        if mlp is None or mlp.width != 256 or len(tuple(mlp.skips)) != 1 \
                or getattr(mlp, "view_depth", 1) != 1 \
                or not mlp.use_viewdirs:
            return None
    depth = net.coarse.depth
    skips = tuple(net.coarse.skips)
    xyz_enc = net.xyz_encoder
    dir_enc = net.dir_encoder
    try:
        in_dim = xyz_enc.output_dim
        view_dim = dir_enc.output_dim
        packed = {m: pack_nerf_params_t(mlps[m], in_dim, view_dim,
                                        depth=depth, skips=skips)
                  for m in ("coarse", "fine")}
    except (AssertionError, KeyError):
        return None

    # frequency encoders fuse INTO the kernel (identity + sin/cos bands on
    # the VPU); other encoder types encode in XLA and use the
    # features-in kernel
    from ...models.encoding.freq import FrequencyEncoder

    freq_fused = (isinstance(xyz_enc, FrequencyEncoder)
                  and isinstance(dir_enc, FrequencyEncoder)
                  and xyz_enc.include_input and dir_enc.include_input
                  and xyz_enc.input_dim == 3 and dir_enc.input_dim == 3)

    def apply_fn(_params, pts, viewdirs, model):
        shape = pts.shape[:-1]
        pts_flat = pts.reshape(-1, 3)
        dirs = jnp.broadcast_to(viewdirs, shape + (3,)).reshape(-1, 3)
        branch = "fine" if model == "fine" else "coarse"
        if freq_fused:
            # transposed (3, N) feeds: lane-dense DMA into the kernel
            # (XLA fuses the transpose into the pts/dirs producers)
            raw = fused_nerf_mlp_enc_t(packed[branch], pts_flat.T, dirs.T,
                                       xyz_enc.n_freqs, dir_enc.n_freqs)
        else:
            raw = fused_nerf_mlp(packed[branch], xyz_enc(pts_flat),
                                 dir_enc(dirs))
        return raw.reshape(*shape, 4)

    return apply_fn
