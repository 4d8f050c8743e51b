"""Training losses (reference ``train_stereo.py:41-182``).

All losses are pure jnp functions over NHWC tensors, returning
``(loss, metrics_dict)`` with metrics as jnp scalars (no host sync — the
caller decides when to fetch).

- :func:`sequence_loss`      — γ-weighted L1 over per-iteration (disp,
  refined) pairs + 0.1·L1 on init/mono (reference :96).
- :func:`init_loss`          — cost-volume contrastive loss at 1/4 scale
  (reference :138).
- :func:`disp_normal_loss`   — L1 + (1−cos) on disparity normals (:67).
- :func:`disp_grad_loss`     — L1 on refined disparity gradients (:41).
- :func:`loss_weights`       — γ-schedule (:364-367).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from tcs_tpu.geometry import disp2disp_normal_xy
from tcs_tpu.ops.sampler import (
    max_pool,
    median_pool,
    resize_bilinear,
    resize_nearest,
)


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of x over mask (bool/0-1), numerically safe for empty masks."""
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def loss_weights(n_predictions: int, gamma: float = 0.9) -> jnp.ndarray:
    """w_i = (γ^(15/(n−1)))^(n−1−i) (reference train_stereo.py:364-367)."""
    if n_predictions == 1:
        return jnp.ones((1,), jnp.float32)
    adjusted = gamma ** (15.0 / (n_predictions - 1))
    return jnp.asarray(
        [adjusted ** (n_predictions - 1 - i) for i in range(n_predictions)],
        jnp.float32,
    )


def sequence_loss(flow_mono, flow_init, flow_preds, flow_gt, valid,
                  weights) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """L1 sequence loss (reference :96-135).

    Args:
      flow_mono / flow_init: (B, H, W, 1) full-res flows (≤0).
      flow_preds: tuple (flows_up, flows_refine_up) each (iters, B, H, W, 1).
      flow_gt: (B, H, W, 1); valid: (B, H, W, 1) bool.
      weights: (iters,) γ-schedule.
    """
    flows_up, flows_refine_up = flow_preds
    n = flows_up.shape[0]
    v = valid.astype(jnp.float32)

    loss = 0.1 * masked_mean(jnp.abs(flow_init - flow_gt), v)
    loss += 0.1 * masked_mean(jnp.abs(flow_mono - flow_gt), v)

    per_iter = jnp.abs(flows_up - flow_gt[None]) + 1.2 * jnp.abs(
        flows_refine_up - flow_gt[None]
    )
    # masked mean per iteration, then weighted sum
    m = v[None]
    denom = jnp.maximum(jnp.sum(v), 1.0)
    iter_means = jnp.sum(per_iter * m, axis=(1, 2, 3, 4)) / denom
    loss += jnp.sum(weights * iter_means)

    epe = jnp.sqrt(jnp.sum((flows_up[-1] - flow_gt) ** 2, axis=-1))
    epe_refine = jnp.sqrt(jnp.sum((flows_refine_up[-1] - flow_gt) ** 2, axis=-1))
    epe_init = jnp.sqrt(jnp.sum((flow_init - flow_gt) ** 2, axis=-1))
    vm = v[..., 0]

    def mm(x):
        return jnp.sum(x * vm) / jnp.maximum(jnp.sum(vm), 1.0)

    metrics = {
        "epe": mm(epe),
        "epe_refine": mm(epe_refine),
        "epe_init": mm(epe_init),
        "1px": mm((epe < 1).astype(jnp.float32)),
        "3px": mm((epe < 3).astype(jnp.float32)),
        "5px": mm((epe < 5).astype(jnp.float32)),
        "1px_refine": mm((epe_refine < 1).astype(jnp.float32)),
        "3px_refine": mm((epe_refine < 3).astype(jnp.float32)),
        "5px_refine": mm((epe_refine < 5).astype(jnp.float32)),
    }
    return loss, metrics


def _topk_values(x: jax.Array, k: int) -> jax.Array:
    """Top-k values along the last axis by k rounds of first-occurrence
    argmax + mask — identical to ``lax.top_k`` values (including tie order
    and the gradient's scatter-to-selected-index), but lowered as fused
    reductions instead of an XLA ``sort`` HLO (measured 27 ms/train-step at
    TartanAir shapes for k=3 vs ~1 ms fused)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    outs = []
    for _ in range(k):
        idx = jnp.argmax(x, axis=-1, keepdims=True)  # first max, like top_k
        # One-hot reduction ≡ take_along_axis(x, idx): same value and the
        # same cotangent routing (exactly the j == idx position), but a
        # dense fused select+sum instead of a per-element minor-axis gather
        # (the gathers measured 26.5 ms/step in the hoisted-loss trace).
        outs.append(jnp.sum(jnp.where(iota == idx, x, 0.0), axis=-1,
                            keepdims=True))
        x = jnp.where(iota == idx, -jnp.inf, x)
    return jnp.concatenate(outs, axis=-1)


def init_loss(cost_volume, flow_gt, valid, max_flow: float = 700.0, k: int = 1,
              scale: float = 0.25, threshold: float = 0.1):
    """Cost-volume contrastive loss (reference :138-182).

    Pulls the (linearly interpolated) cost at the GT disparity towards 1 and
    pushes the top-k off-band peaks below φ(d_gt) − threshold.

    Args:
      cost_volume: (B, h, w, W2) masked cosine cost volume (our layout; the
        reference uses (B, W2, h, w)).
      flow_gt: (B, H, W, 1) full-res flow (≤0); valid: (B, H, W, 1).
    """
    B, h, w, W2 = cost_volume.shape
    flow_q = scale * resize_nearest(flow_gt, (h, w))
    valid_q = resize_bilinear(valid.astype(jnp.float32), (h, w))
    mag = jnp.abs(flow_q)
    valid_q = (valid_q == 1.0) & (mag < max_flow * scale)

    def phi(d):
        """Linear interpolation of the cost row at fractional index d as a
        one-hot weighted reduction (bit-exact vs the two-gather form: the
        same two products and one add, plus exact +0 terms; out-of-range
        d = W2−1 has frac = 0 so the vanished dfi+1 tap matches the
        reference's clip). No gather primitive — the minor-axis gathers
        were the single hottest non-conv op of the hoisted train step."""
        df = jnp.floor(d)
        frac = d - df
        dfi = df.astype(jnp.int32)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W2), 3)
        wgt = (1.0 - frac) * (j == dfi) + frac * (j == dfi + 1)
        # Select before multiplying so a non-finite cell elsewhere in the
        # row cannot poison the reduction via 0·inf = NaN — keeps the NaN
        # blast radius of the dense one-hot form identical to the two-tap
        # gather it replaced (the reference asserts the cost volume finite,
        # torch.isinf at train_stereo.py:140).
        return jnp.sum(jnp.where(wgt != 0, cost_volume, 0.0) * wgt,
                       axis=-1, keepdims=True)

    disp_gt = -flow_q  # (B,h,w,1)
    x_idx = jax.lax.broadcasted_iota(jnp.float32, (B, h, w, 1), 2)
    index_gt = x_idx - disp_gt
    in_range = (index_gt >= 0) & (index_gt <= W2 - 1)
    mask = in_range & valid_q
    index_gt = jnp.clip(index_gt, 0, W2 - 1)
    # GT-side (no gradients flow into the index/mask/band — only into the
    # cost volume through the gathers): saved under frame remat.
    index_gt = checkpoint_name(index_gt, "loss_gt")
    mask = checkpoint_name(mask, "loss_gt")
    phi_gt = phi(index_gt)  # (B,h,w,1)
    gt_loss = 1.0 - masked_mean(phi_gt, mask)

    j = jax.lax.broadcasted_iota(jnp.float32, (B, h, w, W2), 3)
    band = (j >= index_gt - 1.5) & (j < index_gt + 1.5)
    suppress = checkpoint_name(band | (~mask), "loss_gt")
    cv_nm = jnp.where(suppress, 0.0, cost_volume)
    cost_nm = _topk_values(cv_nm, k)  # (B,h,w,k)
    hinge = jnp.clip(
        cost_nm + threshold - jax.lax.stop_gradient(phi_gt), 0.0, None
    )
    nm_loss = masked_mean(hinge, jnp.broadcast_to(mask, hinge.shape))
    total = gt_loss + nm_loss
    metrics = {
        "init_loss": total,
        "init_gt_loss": gt_loss,
        "init_nm_loss": nm_loss,
        "forward_mask_rate": jnp.mean(
            (cost_nm[..., :1] + 0.3 - phi_gt > 0).astype(jnp.float32)
        ),
    }
    return total, metrics


def disp_normal_loss(flow_q_preds, disp_norm_gt, valid, weights,
                     scale: float = 0.25, dense_gt: bool = True):
    """Disparity-normal loss on both per-iteration q-scale predictions
    (reference :67-93).

    Args:
      flow_q_preds: tuple (flow_q, flow_q_refine), each (iters, B, h, w, 1).
      disp_norm_gt: (B, H, W, 3) full-res GT normals.
      valid: (B, H, W, 1).
    """
    flow_q_seq, flow_refine_seq = flow_q_preds
    n = flow_q_seq.shape[0]
    gt = median_pool(disp_norm_gt, int(round(1.0 / scale)))  # (B,h,w,3)
    # GT-side, gradient-free: saved under frame remat (see train_step
    # frame_losses) so the replay skips the median selection networks.
    gt = checkpoint_name(gt, "loss_gt")
    mask = (gt[..., 0:1] / gt[..., 2:3] < 5) & (gt[..., 1:2] / gt[..., 2:3] < 5)
    if dense_gt:
        v = max_pool(valid.astype(jnp.float32), 4, 4, 0) > 0
    else:
        v = resize_bilinear(valid.astype(jnp.float32), gt.shape[1:3]) == 1.0
    v = checkpoint_name(v & mask, "loss_gt")

    def one_term(flow_q):
        disp = -flow_q
        normal, _ = disp2disp_normal_xy(disp)
        l1 = jnp.mean(jnp.abs(normal - gt[None]), axis=-1, keepdims=True)
        cos = jnp.sum(normal * gt[None], axis=-1, keepdims=True)
        return 0.5 * l1 + 0.5 * (1.0 - cos)  # (iters,B,h,w,1)

    vm = v[None].astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(v), 1.0)
    i_loss = jnp.sum(one_term(flow_q_seq) * vm, axis=(1, 2, 3, 4)) / denom
    i_loss_ref = jnp.sum(one_term(flow_refine_seq) * vm, axis=(1, 2, 3, 4)) / denom
    loss = jnp.sum(weights * (i_loss + 1.2 * i_loss_ref))
    return loss, {"norm_loss": loss}


def disp_grad_loss(disp_grad_preds, disp_grad_gt, valid, weights,
                   scale: float = 0.25, dense_gt: bool = True):
    """Disparity-gradient loss on the refined gradients (reference :41-64).

    Args:
      disp_grad_preds: (iters, B, h, w, 2) refined gradients.
      disp_grad_gt: (B, H, W, 2) full-res GT gradients.
      valid: (B, H, W, 1).
    """
    gt = median_pool(disp_grad_gt, int(round(1.0 / scale)))
    gt = checkpoint_name(gt, "loss_gt")  # GT-side, gradient-free
    mask = (gt[..., 0:1] < 5) & (gt[..., 1:2] < 5)
    if dense_gt:
        v = max_pool(valid.astype(jnp.float32), 4, 4, 0) > 0
    else:
        v = resize_bilinear(valid.astype(jnp.float32), gt.shape[1:3]) == 1.0
    v = checkpoint_name(v & mask, "loss_gt")

    i_loss = jnp.mean(
        jnp.abs(disp_grad_preds - gt[None]), axis=-1, keepdims=True
    )  # (iters,B,h,w,1)
    vm = v[None].astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(v), 1.0)
    per_iter = jnp.sum(i_loss * vm, axis=(1, 2, 3, 4)) / denom
    loss = jnp.sum(weights * per_iter)
    return loss, {"grad_loss": loss}
