"""Forward softmax splatting (TPU-native).

The reference implements forward warping with a cupy-JIT CUDA kernel using
``atomicAdd`` (``core/utils/splatting/softsplat.py:232-345``) plus two custom
backward kernels. Non-deterministic float atomics do not exist on TPU — and we
don't want them: here the scatter-add is expressed with ``jnp``'s functional
``.at[].add`` (lowered by XLA to a deterministic scatter) and differentiated by
JAX autodiff, which produces exactly the gather-based backward the reference
hand-writes (value-grad via weighted gathers of the output cotangent; flow-grad
via the bilinear-weight derivatives).

Modes mirror the reference wrapper (``softsplat.py:232-274``):
``'sum' | 'avg' | 'linear[-addeps|-clipeps]' | 'soft[-addeps|-clipeps]'``.
Only ``'soft-clipeps'`` is exercised by the model (``geo_utils.py:196``).

Backends: ``'xla'`` (four per-tap scatter-adds) and ``'xla_fused'`` (one
combining scatter over all four taps); cross-checked in tests and
micro-benchmarked by scripts/bench_components.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-7


def splat_sum(values: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear forward scatter-add of ``values`` along ``flow``.

    Each source pixel (x, y) contributes ``values[b, y, x]`` to the four
    integer neighbours of (x + flow_x, y + flow_y), weighted bilinearly.
    Contributions landing outside the image are dropped; non-finite targets
    are skipped (reference kernel ``softsplat.py:301-302``).

    values: (B, H, W, C), flow: (B, H, W, 2) → (B, H, W, C).
    """
    B, H, W, C = values.shape
    dtype = values.dtype

    gx = lax.broadcasted_iota(dtype, (B, H, W), 2)
    gy = lax.broadcasted_iota(dtype, (B, H, W), 1)
    tx = gx + flow[..., 0]
    ty = gy + flow[..., 1]
    finite = jnp.isfinite(tx) & jnp.isfinite(ty)
    # Push non-finite targets far out of bounds so all four taps are invalid.
    tx = jnp.where(finite, tx, -10.0)
    ty = jnp.where(finite, ty, -10.0)

    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)

    out = jnp.zeros((B, H * W, C), dtype)
    b_idx = lax.broadcasted_iota(jnp.int32, (B, H * W), 0)

    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        # Bilinear weight of this tap (product of 1-distances).
        wx = 1.0 - jnp.abs(tx - xi)
        wy = 1.0 - jnp.abs(ty - yi)
        w = wx * wy
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        w = jnp.where(valid, w, 0.0)
        idx = (
            jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W
            + jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        )
        contrib = (values * w[..., None]).reshape(B, H * W, C)
        out = out.at[b_idx, idx.reshape(B, H * W)].add(
            contrib, mode="drop", indices_are_sorted=False, unique_indices=False
        )
    return out.reshape(B, H, W, C)


def splat_sum_fused(values: jax.Array, flow: jax.Array) -> jax.Array:
    """Same contract as :func:`splat_sum`, but all four bilinear taps are
    concatenated into ONE combining scatter-add (4·H·W updates, a single
    pass over the output) instead of four separate scatters. Numerically
    identical up to fp addition order within a target cell."""
    B, H, W, C = values.shape
    dtype = values.dtype

    gx = lax.broadcasted_iota(dtype, (B, H, W), 2)
    gy = lax.broadcasted_iota(dtype, (B, H, W), 1)
    tx = gx + flow[..., 0]
    ty = gy + flow[..., 1]
    finite = jnp.isfinite(tx) & jnp.isfinite(ty)
    tx = jnp.where(finite, tx, -10.0)
    ty = jnp.where(finite, ty, -10.0)
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)

    idxs, contribs = [], []
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        w = (1.0 - jnp.abs(tx - xi)) * (1.0 - jnp.abs(ty - yi))
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        w = jnp.where(valid, w, 0.0)
        idxs.append(
            jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W
            + jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        )
        contribs.append((values * w[..., None]).reshape(B, H * W, C))
    idx = jnp.concatenate([i.reshape(B, H * W) for i in idxs], axis=1)
    upd = jnp.concatenate(contribs, axis=1)
    b_idx = lax.broadcasted_iota(jnp.int32, (B, 4 * H * W), 0)
    out = jnp.zeros((B, H * W, C), dtype)
    out = out.at[b_idx, idx].add(upd, mode="drop")
    return out.reshape(B, H, W, C)


@jax.custom_vjp
def splat_sum_gatherbwd(values: jax.Array, flow: jax.Array) -> jax.Array:
    """:func:`splat_sum` with a hand-written gather-based VJP.

    JAX autodiff transposes the forward's combining scatter-add, which XLA
    lowers to serialized while-loops on TPU (measured 79.5 ms/step of the
    TartanAir train step). The adjoint of a bilinear scatter is a bilinear
    GATHER, so this backend supplies the backward explicitly — the exact
    math of the reference's hand-written CUDA backward kernels
    (``softsplat.py:368-436`` ingrad: per-source-pixel weighted gather of
    the output cotangent; ``:439-524`` flowgrad: the same four gathers
    contracted with ``values`` and the bilinear-weight derivatives) — using
    the same linear-index row gathers as ``bilinear_sampler``.
    Forward is bit-identical to ``splat_sum``; gradients agree with JAX
    autodiff to fp tolerance (tests/test_splat.py).
    """
    return splat_sum(values, flow)


def _splat_gatherbwd_fwd(values, flow):
    return splat_sum(values, flow), (values, flow)


def _splat_gatherbwd_bwd(res, g):
    values, flow = res
    B, H, W, C = values.shape
    dtype = values.dtype

    gx = lax.broadcasted_iota(dtype, (B, H, W), 2)
    gy = lax.broadcasted_iota(dtype, (B, H, W), 1)
    tx = gx + flow[..., 0]
    ty = gy + flow[..., 1]
    finite = jnp.isfinite(tx) & jnp.isfinite(ty)
    tx = jnp.where(finite, tx, -10.0)
    ty = jnp.where(finite, ty, -10.0)
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)

    gflat = g.reshape(B, H * W, C)
    dvalues = jnp.zeros_like(values)
    dtx = jnp.zeros((B, H, W), dtype)
    dty = jnp.zeros((B, H, W), dtype)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        lin = (
            jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W
            + jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        ).reshape(B, H * W)
        gval = jnp.take_along_axis(gflat, lin[..., None], axis=1).reshape(
            B, H, W, C)
        gval = gval * valid[..., None].astype(dtype)
        wx = 1.0 - jnp.abs(tx - xi)
        wy = 1.0 - jnp.abs(ty - yi)
        # d wx / d tx: tap at floor → wx = x0+1−tx (−1); tap at floor+1 →
        # wx = tx−x0 (+1). Same for y (reference flowgrad weight derivatives,
        # softsplat.py:480-497).
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        dvalues = dvalues + (wx * wy)[..., None] * gval
        dot = jnp.sum(values * gval, axis=-1)
        dtx = dtx + sx * wy * dot
        dty = dty + wx * sy * dot
    dflow = jnp.stack([dtx, dty], axis=-1)
    # non-finite targets: forward contributes nothing and the where() blocks
    # the flow gradient (taps are out of bounds anyway; this is belt and
    # braces for the -10 sentinel sitting near the image corner).
    dflow = dflow * finite[..., None].astype(dtype)
    return dvalues, dflow


splat_sum_gatherbwd.defvjp(_splat_gatherbwd_fwd, _splat_gatherbwd_bwd)


def softsplat(values: jax.Array, flow: jax.Array, metric, mode: str,
              valid_mask=None, backend: str = "xla"):
    """Softmax splatting (reference ``softsplat.py:232``).

    Args:
      values: (B, H, W, C) features to warp.
      flow: (B, H, W, 2) forward flow (x, y).
      metric: (B, H, W, 1) importance metric, or None for 'sum'/'avg'.
      mode: 'sum' | 'avg' | 'linear[-addeps|-clipeps]' | 'soft[-addeps|-clipeps]'.
      valid_mask: (B, H, W, 1) or None; invalid sources contribute nothing.
      backend: 'xla' (four per-tap scatter-adds, autodiff backward) |
        'xla_gatherbwd' (same forward, hand-written gather VJP — no
        scatter-transpose while-loops in the backward) | 'xla_fused' (one
        combining scatter) | 'xla_aligned' (lane-aligned split). A Pallas
        scatter kernel was evaluated and NOT built: TPU has no atomics, so
        it would need either serialized per-pixel stores (≈ XLA's scatter
        speed) or a bounded-flow shift decomposition (~2× at best on ~4%
        of end-to-end time); the gather-VJP backend addresses the real
        cost, the backward transpose (PERF.md).

    Returns:
      (warped (B, H, W, C), coverage_mask (B, H, W, 1)) for normalising modes;
      for mode='sum', (warped, ones).
    """
    base = mode.split("-")[0]
    assert base in ("sum", "avg", "linear", "soft"), mode
    if valid_mask is None:
        valid_mask = jnp.ones_like(values[..., :1])
    values = values * valid_mask

    if base == "sum":
        assert metric is None
        out = _dispatch(values, flow, backend)
        return out, jnp.ones_like(values[..., :1])

    if base == "avg":
        weight = valid_mask
    elif base == "linear":
        assert metric is not None
        weight = metric
    else:  # soft
        assert metric is not None
        weight = jnp.exp(metric)

    # The aligned split only applies to the fp32 combined splat (disparity +
    # 128-multiple feature block in one call, C % 128 == 1 with C > 1); a
    # 1-channel splat would take a degenerate empty-feature branch, and
    # feature-only C % 128 == 0 splats fall through to the plain scatter.
    if (backend == "xla_aligned" and values.shape[-1] > 1
            and values.shape[-1] % 128 == 1):
        # Lane-aligned split: the stacked (C+1)-channel scatter rows are not a
        # multiple of the 128-lane tile (258 floats for disp+fmap+weight), so
        # every scattered row straddles tile boundaries. Scatter the
        # 128-aligned feature block separately from a tiny
        # (disp·w, w)-channel scatter; identical math, same tap
        # weights/indices (CSE'd by XLA).
        big = splat_sum(values[..., 1:] * weight, flow)
        small = splat_sum(
            jnp.concatenate([values[..., :1] * weight, weight * valid_mask],
                            axis=-1), flow)
        payload = jnp.concatenate([small[..., :1], big], axis=-1)
        norm = small[..., 1:]
    else:
        stacked = jnp.concatenate([values * weight, weight * valid_mask],
                                  axis=-1)
        out = _dispatch(stacked, flow, backend)
        payload = out[..., :-1]
        norm = out[..., -1:]
    mask = (norm != 0).astype(values.dtype)

    suffix = mode.split("-")[1] if "-" in mode else "addeps"
    if suffix == "addeps":
        norm = norm + _EPS
    elif suffix == "clipeps":
        norm = jnp.clip(norm, _EPS, None)
    else:
        raise ValueError(f"unknown softsplat mode suffix: {mode}")

    return payload / norm, mask


def _dispatch(values, flow, backend):
    if backend in ("xla", "xla_aligned"):
        return splat_sum(values, flow)
    if backend == "xla_gatherbwd":
        return splat_sum_gatherbwd(values, flow)
    if backend == "xla_fused":
        return splat_sum_fused(values, flow)
    raise ValueError(f"unknown splat backend: {backend}")
