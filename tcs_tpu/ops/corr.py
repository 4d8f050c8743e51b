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

import functools
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

    Odd widths floor-pool (the trailing element is dropped), matching torch
    ``F.avg_pool1d(kernel=2, stride=2)`` semantics at the reference
    corr.py:21-23 — the SceneFlow recipe's 320×720 crop yields W2 = 180 → 90
    → 45 → 22, which must not crash.
    """
    levels = [cost]
    cur = cost
    for _ in range(num_levels - 1):
        B, H, W1, W2 = cur.shape
        half = W2 // 2
        cur = cur[..., : 2 * half].reshape(B, H, W1, half, 2).mean(axis=-1)
        levels.append(cur)
    return tuple(levels)


def masked_cost_volume(cost: jax.Array) -> jax.Array:
    """Zero out cells with w2 > w1 (negative disparity). (B,H,W1,W2)."""
    B, H, W1, W2 = cost.shape
    w1_idx = lax.broadcasted_iota(jnp.int32, (W1, W2), 0)
    w2_idx = lax.broadcasted_iota(jnp.int32, (W1, W2), 1)
    keep = (w1_idx >= w2_idx).astype(cost.dtype)
    return cost * keep


def lookup_gather(pyramid: Sequence[jax.Array], coords_x: jax.Array,
                  radius: int) -> jax.Array:
    """Reference implementation of the radius lookup: one per-element gather
    per tap neighbour (2 gathers × 2r+1 taps × levels). Simple but slow on
    TPU (scalar gathers along the minor axis); kept as the semantics oracle.
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


def lookup_onehot(pyramid: Sequence[jax.Array], coords_x: jax.Array,
                  radius: int) -> jax.Array:
    """Gather-free lookup: each tap is a one-hot-weighted reduction over the
    full cost row. O(W2) elementwise work per tap instead of a dynamic
    gather — all dense VPU compute that XLA fuses into one loop per tap, no
    scatter/gather primitives at all.
    """
    r = radius
    outs = []
    for i, corr in enumerate(pyramid):
        B, H, W1, W2 = corr.shape
        c = coords_x / (2 ** i)  # (B,H,W1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W2), 3)
        base = jnp.floor(c).astype(jnp.int32)
        frac = (c - base.astype(jnp.float32)).astype(corr.dtype)[..., None]
        taps = []
        for dx in range(-r, r + 1):
            i0 = (base + dx)[..., None]  # (B,H,W1,1); alpha == frac for all taps
            w = (1.0 - frac) * (j == i0) + frac * (j == i0 + 1)
            taps.append(jnp.sum(corr * w, axis=-1))
        outs.append(jnp.stack(taps, axis=-1))
    return jnp.concatenate(outs, axis=-1)


def lookup_roll(pyramid: Sequence[jax.Array], coords_x: jax.Array,
                radius: int) -> jax.Array:
    """One-hot lookup with the selection mask built ONCE per level.

    ``lookup_onehot`` pays two integer compares + two selects per tap per
    cost-volume element (~8 VPU ops × 9 taps). Here the one-hot mask
    ``o = (j == floor(c))`` is built once, and tap k is the masked reduction
    of the cost row *rolled* by −k: ``Σⱼ roll(corr, −k)[j]·o[j] =
    corr[floor(c)+k]`` — one lane-rotate + multiply + add per element per
    tap. Wraparound reads land in an r+1-wide zero pad, so out-of-range taps
    vanish with no validity mask (grid_sample semantics). The 2r+2 integer
    taps are shared between adjacent bilinear outputs, halving the lerp work.
    Numerics identical to :func:`lookup_gather`.

    Measured on TPU v5e at 384×1280: SLOWER than ``lookup_onehot`` end-to-end
    (49.8 vs 41.5 ms/frame) — the r+1 pad breaks the 128-lane alignment of
    the W2 axis and XLA materialises the rolled copies instead of folding the
    rotation into the reduction. Kept as a tested variant, not the default.
    """
    r = radius
    pad = r + 1
    outs = []
    for i, corr in enumerate(pyramid):
        B, H, W1, W2 = corr.shape
        W2p = W2 + 2 * pad
        c = coords_x / (2 ** i)  # (B,H,W1)
        base = jnp.floor(c)
        basei = base.astype(jnp.int32)
        frac = (c - base).astype(corr.dtype)
        # Zero-pad the cost row by r+1 on both sides: every roll by k ∈
        # [−r, r+1] then wraps *only* into the zero pad, so out-of-range taps
        # vanish without any validity mask, for arbitrary coordinates.
        corr_pad = jnp.pad(corr, ((0, 0),) * 3 + ((pad, pad),))
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W2p), 3)
        o = (j == (basei + pad)[..., None]).astype(corr.dtype)
        # Integer taps corr[floor(c)+k] for k in [-r, r+1].
        taps0 = [
            jnp.sum((jnp.roll(corr_pad, -k, axis=-1) if k else corr_pad) * o,
                    axis=-1)
            for k in range(-r, r + 2)
        ]
        # Bilinear outputs for dx in [-r, r] share neighbouring integer taps.
        level = [
            (1.0 - frac) * taps0[t] + frac * taps0[t + 1]
            for t in range(2 * r + 1)
        ]
        outs.append(jnp.stack(level, axis=-1))
    return jnp.concatenate(outs, axis=-1)


def lookup_window(pyramid: Sequence[jax.Array], coords_x: jax.Array,
                  radius: int) -> jax.Array:
    """Radius-window bilinear lookup over all pyramid levels (windowed
    row-gather variant).

    Args:
      pyramid: tuple of (B, H, W1, W2 >> i) volumes.
      coords_x: (B, H, W1) continuous x-position in level-0 W2 units
        (``coords1`` x channel).
      radius: window radius r; each level contributes 2r+1 taps.

    Returns:
      (B, H, W1, num_levels*(2r+1)) fp32, level-major tap ordering matching
      the reference's channel concat (corr.py:38-52).

    TPU strategy: all taps of a pixel live in a *contiguous* window
    [floor(c)−r, floor(c)+r+1] of the cost row, so instead of 2·(2r+1)
    scalar gathers per pixel (minor-axis gathers are the hot spot of the whole
    model — ~3.5 ms each at KITTI shapes) we issue ONE row-gather of the
    2r+2-wide window per pixel per level and do the per-tap bilinear
    interpolation as a fused one-hot weighted reduction over the window
    (pure VPU elementwise, ~10 values per tap). Numerics are identical to
    :func:`lookup_gather` (zero outside [0, W2−1], grid_sample semantics).
    """
    r = radius
    winW = 2 * r + 2
    taps = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)  # (taps,)
    outs = []
    for i, corr in enumerate(pyramid):
        B, H, W1, W2 = corr.shape
        c = coords_x / (2 ** i)  # (B,H,W1)
        base = jnp.floor(c).astype(jnp.int32)
        ww = min(winW, W2)  # coarse levels may be narrower than the window
        start = jnp.clip(base - r, 0, W2 - ww)

        if ww == W2:
            win = corr  # whole row already fits the window
        else:
            # One contiguous window gather per pixel: rows (B*H*W1, W2)
            # sliced at per-row dynamic starts with static size ww.
            rows = corr.reshape(B * H * W1, W2)
            starts = start.reshape(B * H * W1, 1)
            win = jax.lax.gather(
                rows,
                jnp.concatenate(
                    [
                        jnp.arange(B * H * W1, dtype=jnp.int32)[:, None],
                        starts,
                    ],
                    axis=1,
                ),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0, 1),
                ),
                slice_sizes=(1, ww),
                mode=jax.lax.GatherScatterMode.CLIP,
            ).reshape(B, H, W1, ww)

        # Per-tap absolute neighbour positions and in-window offsets.
        n0 = base[..., None] + dx.astype(jnp.int32)  # (B,H,W1,taps) = floor(c+dx)
        alpha = (c[..., None] + dx) - n0.astype(jnp.float32)
        rel0 = n0 - start[..., None]  # in-window index of the left neighbour

        s = jnp.arange(ww, dtype=jnp.int32)  # (ww,)
        valid0 = (n0 >= 0) & (n0 <= W2 - 1)
        valid1 = (n0 + 1 >= 0) & (n0 + 1 <= W2 - 1)
        onehot0 = (rel0[..., None] == s) & valid0[..., None]
        onehot1 = (rel0[..., None] + 1 == s) & valid1[..., None]
        weights = (
            (1.0 - alpha)[..., None] * onehot0.astype(corr.dtype)
            + alpha[..., None] * onehot1.astype(corr.dtype)
        )  # (B,H,W1,taps,winW)
        outs.append(jnp.einsum("bhwts,bhws->bhwt", weights, win))
    return jnp.concatenate(outs, axis=-1)


def build_cost_volume_w2major(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """Cosine cost volume in (B, H, W2, W1) layout — W2 on the sublane axis.

    Same numerics as :func:`build_cost_volume` (a second MXU einsum, NOT a
    transpose of it — cheaper than moving 38 MB through HBM twice). Used by
    the W2-major lookup, where the per-tap reduction runs down the sublane
    axis instead of the lane axis: lane reductions are log-shuffle chains on
    the VPU while sublane reductions are straight vector adds, which makes
    the lookup compute-bound cost ~3× lower (measured on v5e).
    """
    f1 = l2_normalize(fmap1.astype(jnp.float32))
    f2 = l2_normalize(fmap2.astype(jnp.float32))
    return jnp.einsum("bhvc,bhwc->bhvw", f2, f1,
                      preferred_element_type=jnp.float32)


def corr_pyramid_w2major(cost_T: jax.Array, num_levels: int) -> Tuple[jax.Array, ...]:
    """Average-pool pyramid along W2 (axis -2) of a (B,H,W2,W1) volume.

    Odd widths floor-pool (torch ``avg_pool1d`` semantics), same as
    :func:`corr_pyramid`.
    """
    levels = [cost_T]
    cur = cost_T
    for _ in range(num_levels - 1):
        B, H, W2, W1 = cur.shape
        half = W2 // 2
        cur = cur[:, :, : 2 * half].reshape(B, H, half, 2, W1).mean(axis=-2)
        levels.append(cur)
    return tuple(levels)


def lookup_onehot_w2major(pyramid_T: Sequence[jax.Array], coords_x: jax.Array,
                          radius: int) -> jax.Array:
    """One-hot lookup over a W2-major pyramid ((B,H,W2i,W1) levels).

    Identical numerics to :func:`lookup_onehot`; the reduction axis is the
    sublane axis (axis 2), which the VPU sums with plain vector adds.

    Formulated over *integer* taps: ``d = j − floor(c)`` is computed once per
    level, the 2r+2 integer taps are masked reductions ``T_k = Σ_j corr·(d=k)``
    (one compare + select + add per element per tap), and the 2r+1 bilinear
    outputs lerp neighbouring integer taps afterwards at (B,H,W1) size.
    Compared to building the bilinear one-hot weights per tap inside the
    reduction (two compares + two weight muls per element), this halves the
    VPU work of the lookup — measured 1.45 → ~0.75 ms/frame at 384×1280 —
    with bit-identical results (each output is still
    ``(1−frac)·corr[i0] + frac·corr[i0+1]`` in the same dtype).
    """
    r = radius
    outs = []
    for i, corr in enumerate(pyramid_T):
        B, H, W2, W1 = corr.shape
        c = coords_x / (2 ** i)  # (B,H,W1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W2, 1), 2)
        base = jnp.floor(c).astype(jnp.int32)[:, :, None, :]  # (B,H,1,W1)
        frac = (c[:, :, None, :] - base.astype(jnp.float32)).astype(corr.dtype)
        frac = frac[:, :, 0, :]  # (B,H,W1)
        d = j - base  # (B,H,W2,W1) int32, built once per level
        zero = jnp.zeros((), corr.dtype)
        itaps = [
            jnp.sum(jnp.where(d == k, corr, zero), axis=2)  # (B,H,W1)
            for k in range(-r, r + 2)
        ]
        level = [
            (1.0 - frac) * itaps[t] + frac * itaps[t + 1]
            for t in range(2 * r + 1)
        ]
        outs.append(jnp.stack(level, axis=-1))
    return jnp.concatenate(outs, axis=-1)


@functools.lru_cache(maxsize=None)
def _lookup_w2major_vjp(radius: int, shapes: tuple):
    """custom_vjp wrapper of :func:`lookup_onehot_w2major`, cached per static
    (radius, pyramid shapes/dtypes)."""
    nt = 2 * radius + 1

    @jax.custom_vjp
    def lk(pyr, coords_x):
        return lookup_onehot_w2major(pyr, coords_x, radius)

    def fwd(pyr, coords_x):
        return lk(pyr, coords_x), coords_x

    def bwd(coords_x, g):
        douts = []
        for i, (shape, dtname) in enumerate(shapes):
            _, _, W2i, _ = shape
            dt = jnp.dtype(dtname)
            gl = g[..., i * nt:(i + 1) * nt]  # (B,H,W1,nt)
            c = coords_x / (2 ** i)
            base = jnp.floor(c).astype(jnp.int32)
            frac = (c - base.astype(jnp.float32)).astype(dt)
            one = jnp.ones((), dt)
            # Integer-tap cotangents (transpose of the lerp in the forward):
            # dT_k = (1−frac)·g_k + frac·g_{k−1}.
            gints = []
            for t in range(nt + 1):
                v = jnp.zeros(gl.shape[:-1], dt)
                if t < nt:
                    v = v + (one - frac) * gl[..., t]
                if t >= 1:
                    v = v + frac * gl[..., t - 1]
                gints.append(v)
            j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W2i, 1), 2)
            d = j - base[:, :, None, :]
            acc = jnp.zeros(shape, dt)
            zero = jnp.zeros((), dt)
            for t in range(nt + 1):
                acc = acc + jnp.where(d == (t - radius),
                                      gints[t][:, :, None, :], zero)
            douts.append(acc)
        return tuple(douts), jnp.zeros_like(coords_x)

    lk.defvjp(fwd, bwd)
    return lk


def lookup_onehot_w2major_vjp(pyramid_T: Sequence[jax.Array],
                              coords_x: jax.Array, radius: int) -> jax.Array:
    """:func:`lookup_onehot_w2major` with a hand-written linear VJP.

    The lookup is linear in the pyramid, so the backward needs NO pyramid
    residuals (under frame remat the pyramid doesn't have to be recomputed
    for the lookup's backward) and the cost-volume-sized gradient is built in
    one fused pass per level instead of one per tap.

    CAVEAT: the coordinate gradient is defined as ZERO — valid for this
    model, where the lookup coordinates come from a stop-gradient'd disparity
    (reference detaches ``coords1`` per iteration, tc_stereo.py:176), but NOT
    a general-purpose lookup gradient. ``coords_x`` is stop-gradient'd here
    so the zero cotangent is structurally true for any caller: a
    differentiable coordinate path gets a correct (constant-coords) gradient
    rather than a silently wrong one.
    """
    shapes = tuple((p.shape, str(p.dtype)) for p in pyramid_T)
    coords_x = jax.lax.stop_gradient(coords_x)
    return _lookup_w2major_vjp(radius, shapes)(tuple(pyramid_T), coords_x)


# Default lookup used by the model. Benchmarks on TPU v5e at KITTI shapes:
# per-element gathers (lookup_gather) ≈ 3.5 ms × 8 fusions per iteration;
# windowed row-gather (lookup_window) was worse; the dense one-hot reduction
# (lookup_onehot) avoids gather primitives entirely.
def lookup(pyramid, coords_x, radius: int):
    return lookup_onehot(pyramid, coords_x, radius)


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
