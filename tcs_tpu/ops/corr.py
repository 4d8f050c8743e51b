"""All-pairs 1D correlation cost volume + pyramid lookup (TPU-native).

Equivalent of the reference ``core/corr.py`` (``CorrBlock1D``), reorganised
functionally for JAX:

- :func:`build_cost_volume` — normalized cosine cost via a single einsum
  (MXU-friendly batched matmul), layout (B, H, W1, W2) with W2 innermost so
  pyramid pooling and radius lookups stay on the fast axis.
- :func:`corr_pyramid` — 1D average pooling over W2 (reference corr.py:21-23).
- :func:`masked_cost_volume` — zero where w2 > w1 (no negative disparity,
  reference corr.py:26-31).
- :func:`lookup` — radius-window bilinear lookup across pyramid levels
  (reference corr.py:33-52).
- :func:`argmax_disp` — sparse semi-dense initialisation: max-cost peak with
  ±1.5 px suppression band and a margin test over the runner-up
  (reference corr.py:67-79; the 0.3 margin is hard-coded there).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch ``F.normalize``: x / max(‖x‖₂, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def build_cost_volume(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """Cosine cost volume.

    fmap1: (B, H, W1, C), fmap2: (B, H, W2, C) → (B, H, W1, W2), fp32.
    Reference ``core/corr.py:54-62`` (features L2-normalized per pixel →
    cost in [−1, 1]).
    """
    f1 = l2_normalize(fmap1.astype(jnp.float32))
    f2 = l2_normalize(fmap2.astype(jnp.float32))
    return jnp.einsum("bhwc,bhvc->bhwv", f1, f2, preferred_element_type=jnp.float32)


def corr_pyramid(cost: jax.Array, num_levels: int) -> Tuple[jax.Array, ...]:
    """Average-pool pyramid along W2. Level 0 is the raw volume.

    Only levels 0..num_levels-1 are ever looked up (the reference builds one
    extra level it never uses, corr.py:21-23 vs :39).
    """
    levels = [cost]
    cur = cost
    for _ in range(num_levels - 1):
        B, H, W1, W2 = cur.shape
        cur = cur.reshape(B, H, W1, W2 // 2, 2).mean(axis=-1)
        levels.append(cur)
    return tuple(levels)


def masked_cost_volume(cost: jax.Array) -> jax.Array:
    """Zero out cells with w2 > w1 (negative disparity). (B,H,W1,W2)."""
    B, H, W1, W2 = cost.shape
    w1_idx = lax.broadcasted_iota(jnp.int32, (W1, W2), 0)
    w2_idx = lax.broadcasted_iota(jnp.int32, (W1, W2), 1)
    keep = (w1_idx >= w2_idx).astype(cost.dtype)
    return cost * keep


def lookup(pyramid: Sequence[jax.Array], coords_x: jax.Array, radius: int) -> jax.Array:
    """Radius-window bilinear lookup over all pyramid levels.

    Args:
      pyramid: tuple of (B, H, W1, W2 >> i) volumes.
      coords_x: (B, H, W1) continuous x-position in level-0 W2 units
        (``coords1`` x channel).
      radius: window radius r; each level contributes 2r+1 taps.

    Returns:
      (B, H, W1, num_levels*(2r+1)) fp32, level-major tap ordering matching
      the reference's channel concat (corr.py:38-52).
    """
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    outs = []
    for i, corr in enumerate(pyramid):
        W2 = corr.shape[-1]
        x0 = coords_x[..., None] / (2 ** i) + dx  # (B,H,W1,2r+1)
        xf = jnp.floor(x0)
        alpha = (x0 - xf).astype(corr.dtype)
        i0 = xf.astype(jnp.int32)
        i1 = i0 + 1

        def tap(idx):
            valid = (idx >= 0) & (idx <= W2 - 1)
            g = jnp.take_along_axis(corr, jnp.clip(idx, 0, W2 - 1), axis=-1)
            return g * valid.astype(corr.dtype)

        outs.append((1.0 - alpha) * tap(i0) + alpha * tap(i1))
    return jnp.concatenate(outs, axis=-1)


def argmax_disp(cost_masked: jax.Array, margin: float = 0.3,
                suppress_radius: float = 1.5):
    """Semi-dense disparity bootstrap from the masked cost volume.

    For every pixel: take the max-cost match, suppress a ±suppress_radius px
    band around it, find the runner-up peak, and keep the pixel only when the
    margin over the runner-up exceeds ``margin``.

    cost_masked: (B, H, W1, W2).
    Returns (sparse_disp, main_cost, mask), each (B, H, W1, 1).
    Reference ``core/corr.py:67-79``.
    """
    B, H, W1, W2 = cost_masked.shape
    main_cost = jnp.max(cost_masked, axis=-1, keepdims=True)
    index = jnp.argmax(cost_masked, axis=-1, keepdims=True)  # (B,H,W1,1)

    j = lax.broadcasted_iota(jnp.int32, (B, H, W1, W2), 3)
    jf = j.astype(jnp.float32)
    idxf = index.astype(jnp.float32)
    band = (jf >= idxf - suppress_radius) & (jf < idxf + suppress_radius)
    sub_cost = jnp.max(
        jnp.where(band, jnp.zeros_like(cost_masked), cost_masked),
        axis=-1,
        keepdims=True,
    )
    mask = (main_cost - sub_cost > margin).astype(cost_masked.dtype)

    w1_idx = lax.broadcasted_iota(jnp.int32, (B, H, W1, 1), 2)
    disp = (w1_idx - index).astype(cost_masked.dtype)
    return disp * mask, main_cost * mask, mask
