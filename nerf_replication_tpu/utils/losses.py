"""Loss library.

Capability parity with the legacy loss collection the reference carries
in src/utils/net_utils.py (FocalLoss :46, SmoothL1Loss :90, AELoss :99,
PolyMatchingLoss :142, AttentionLoss :194, Ind2dRegL1Loss :232,
GeoCrossEntropyLoss :270) — unused by the NeRF path there, provided here
as pure-JAX functions for the same parent-framework tasks, plus the MSE
and PSNR helpers the NeRF path actually uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def psnr(pred, target, data_range: float = 1.0):
    return -10.0 * jnp.log10(jnp.maximum(mse(pred, target), 1e-10) /
                             data_range**2)


def smooth_l1(pred, target, beta: float = 1.0, reduce_mean: bool = True):
    """Huber/smooth-L1 (reference SmoothL1Loss, net_utils.py:90)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    return loss.mean() if reduce_mean else loss


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Binary focal loss on logits (reference FocalLoss, net_utils.py:46)."""
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jnp.log(p + 1e-8) + (1 - targets) * jnp.log(1 - p + 1e-8))
    p_t = targets * p + (1 - targets) * (1 - p)
    a_t = targets * alpha + (1 - targets) * (1 - alpha)
    return jnp.mean(a_t * (1 - p_t) ** gamma * ce)


def ae_loss(embeddings, group_ids, pull_weight: float = 1.0,
            push_weight: float = 1.0):
    """Associative-embedding grouping loss (reference AELoss,
    net_utils.py:99): pull members toward their group mean, push group
    means apart. embeddings (N, E), group_ids (N,) int."""
    n_groups = int(jnp.max(group_ids)) + 1
    one_hot = jax.nn.one_hot(group_ids, n_groups)            # (N, G)
    counts = one_hot.sum(0) + 1e-8
    means = (one_hot.T @ embeddings) / counts[:, None]        # (G, E)
    pull = jnp.mean(jnp.sum((embeddings - means[group_ids]) ** 2, -1))
    dist = jnp.linalg.norm(means[:, None] - means[None], axis=-1)
    margin = 1.0
    push = jnp.sum(jax.nn.relu(margin - dist) *
                   (1 - jnp.eye(n_groups))) / max(n_groups * (n_groups - 1), 1)
    return pull_weight * pull + push_weight * push


def poly_matching_loss(pred_poly, gt_poly):
    """Rotation-invariant polygon matching (reference PolyMatchingLoss,
    net_utils.py:142): min over cyclic vertex shifts of mean L1.
    pred/gt: (B, N, 2)."""
    n = gt_poly.shape[-2]
    losses = []
    for shift in range(n):
        rolled = jnp.roll(gt_poly, shift, axis=-2)
        losses.append(jnp.mean(jnp.abs(pred_poly - rolled), axis=(-1, -2)))
    return jnp.mean(jnp.min(jnp.stack(losses, -1), axis=-1))


def attention_loss(att_maps, gt_masks, beta: float = 4.0):
    """Scaled BCE on attention maps (reference AttentionLoss,
    net_utils.py:194)."""
    pos = gt_masks > 0.5
    num_pos = jnp.sum(pos) + 1e-8
    num_neg = jnp.sum(~pos) + 1e-8
    w_pos = num_neg / (num_pos + num_neg) * beta
    w_neg = num_pos / (num_pos + num_neg)
    p = jnp.clip(att_maps, 1e-6, 1 - 1e-6)
    bce = -(jnp.where(pos, w_pos, 0.0) * jnp.log(p) +
            jnp.where(~pos, w_neg, 0.0) * jnp.log(1 - p))
    return jnp.mean(bce)


def ind_2d_reg_l1(pred_map, target, ct_ind, ct_mask=None):
    """Regression L1 gathered at 2-D center indices (reference
    Ind2dRegL1Loss, net_utils.py:232). pred_map (B, H*W, C) flattened,
    target (B, K, C), ct_ind (B, K)."""
    gathered = jnp.take_along_axis(
        pred_map, ct_ind[..., None].astype(jnp.int32), axis=1)
    diff = jnp.abs(gathered - target)
    if ct_mask is not None:
        diff = diff * ct_mask[..., None]
        return jnp.sum(diff) / (jnp.sum(ct_mask) * target.shape[-1] + 1e-6)
    return jnp.mean(diff)


def geo_cross_entropy(logits, poly_targets, coords):
    """Geometry-aware cross entropy (reference GeoCrossEntropyLoss,
    net_utils.py:270): soft CE weighted by distance of candidate coords
    to the target vertex. logits (B, K, N), coords (B, K, N, 2),
    poly_targets (B, K, 2)."""
    d2 = jnp.sum((coords - poly_targets[..., None, :]) ** 2, -1)
    soft = jax.nn.softmax(-d2 / (jnp.mean(d2, -1, keepdims=True) + 1e-8), -1)
    logp = jax.nn.log_softmax(logits, -1)
    return -jnp.mean(jnp.sum(soft * logp, -1))
