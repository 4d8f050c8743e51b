"""Sampling / pooling / resizing primitives (pure jnp, NHWC).

TPU-native equivalents of the reference's ``core/utils/utils.py`` helpers
(``coords_grid:100``, ``bilinear_sampler:82``, ``upflow8:106``,
``MedianPool2d:121``) and the ``torch.nn.functional`` resize/pool calls used
throughout the model. All functions use NHWC layout (TPU conv-native) and
static shapes, and are differentiable under ``jax.grad``.

Semantics notes (so numerics match the reference exactly):

- ``bilinear_sampler`` mirrors ``F.grid_sample(align_corners=True,
  padding_mode='zeros')`` driven with *pixel* coordinates: each of the four
  neighbouring taps contributes only while its integer index is in-bounds.
- ``resize_bilinear`` mirrors ``F.interpolate(mode='bilinear',
  align_corners=True)`` (source position ``i*(in-1)/(out-1)``).
- ``avg_pool`` mirrors ``F.avg_pool2d(count_include_pad=True)``.
- ``median_pool`` mirrors torch's *lower* median (index ``(n-1)//2`` of the
  sorted window), which differs from ``jnp.median`` for even window sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """(B, H, W, 2) pixel-coordinate grid with channels (x, y).

    Reference: ``core/utils/utils.py:100`` (channel-first there).
    """
    xs = lax.broadcasted_iota(dtype, (ht, wd), 1)
    ys = lax.broadcasted_iota(dtype, (ht, wd), 0)
    grid = jnp.stack([xs, ys], axis=-1)  # (H, W, 2)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def bilinear_sampler(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``img`` at pixel coordinates with bilinear interpolation.

    Args:
      img: (B, H, W, C) source.
      coords: (B, Ho, Wo, 2) pixel coordinates, channels (x, y).

    Returns:
      (B, Ho, Wo, C); out-of-bounds taps contribute zero
      (``F.grid_sample(padding_mode='zeros', align_corners=True)``,
      reference ``core/utils/utils.py:82``).
    """
    B, H, W, C = img.shape
    Ho, Wo = coords.shape[1:3]
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wa = (x1 - x) * (y1 - y)  # top-left
    wb = (x - x0) * (y1 - y)  # top-right
    wc = (x1 - x) * (y - y0)  # bottom-left
    wd = (x - x0) * (y - y0)  # bottom-right

    # Row gathers over the flattened (H·W, C) image: a single int32 index
    # array per tap, no (…, 2) coordinate tensors anywhere near the gather —
    # 2-channel minor dims drive XLA into badly-tiled layout copies on TPU
    # (measured 0.38 ms per 61 KB copy at 1/8 scale inside the temporal
    # warp path).
    flat = img.reshape(B, H * W, C)

    def gather(iy, ix):
        valid = (
            (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        )
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        lin = (iyc * W + ixc).reshape(B, Ho * Wo)
        vals = jnp.take_along_axis(flat, lin[..., None], axis=1)
        return vals.reshape(B, Ho, Wo, C), valid[..., None].astype(img.dtype)

    va, ma = gather(y0, x0)
    vb, mb = gather(y0, x1)
    vc, mc = gather(y1, x0)
    vd, md = gather(y1, x1)

    out = (
        va * (wa[..., None] * ma)
        + vb * (wb[..., None] * mb)
        + vc * (wc[..., None] * mc)
        + vd * (wd[..., None] * md)
    )
    return out


def _linear_resize_weights(in_size: int, out_size: int, dtype=jnp.float32):
    """align_corners=True source positions → (idx0, idx1, frac)."""
    if out_size == 1:
        pos = jnp.zeros((1,), dtype)
    elif in_size == 1:
        pos = jnp.zeros((out_size,), dtype)
    else:
        pos = jnp.linspace(0.0, in_size - 1.0, out_size, dtype=dtype)
    i0 = jnp.clip(jnp.floor(pos), 0, in_size - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    frac = (pos - i0.astype(dtype))[:, None]
    return i0, i1, frac


def resize_bilinear(x: jax.Array, out_hw) -> jax.Array:
    """Bilinear resize, align_corners=True (``F.interpolate`` equivalent).

    x: (B, H, W, C) → (B, out_h, out_w, C). Separable; indices are static so
    XLA lowers this to efficient static gathers.
    """
    B, H, W, C = x.shape
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if out_h == H and out_w == W:
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dtype)
    if out_h != H:
        i0, i1, f = _linear_resize_weights(H, out_h, dtype)
        xf = xf[:, i0] * (1.0 - f[None, :, :, None]) + xf[:, i1] * f[None, :, :, None]
    if out_w != W:
        j0, j1, g = _linear_resize_weights(W, out_w, dtype)
        g = g[:, 0][None, None, :, None]  # (1, 1, out_w, 1)
        xf = xf[:, :, j0] * (1.0 - g) + xf[:, :, j1] * g
    return xf.astype(x.dtype)


def resize_nearest(x: jax.Array, out_hw) -> jax.Array:
    """Nearest resize matching ``F.interpolate(mode='nearest')``:
    src index = floor(dst * in/out)."""
    B, H, W, C = x.shape
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    iy = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def upflow(flow: jax.Array, factor: int) -> jax.Array:
    """``upflow8`` generalisation: bilinear ×factor and scale values by factor.

    Reference: ``core/utils/utils.py:106``. flow: (B, H, W, C).
    """
    B, H, W, C = flow.shape
    return factor * resize_bilinear(flow, (factor * H, factor * W))


def _window_slices(x: jax.Array, window: int, stride: int, padding: int,
                   pad_value: float):
    """Yield the window·window strided slices of the padded input.

    Implemented with static slicing instead of ``lax.reduce_window`` because
    reduce_window cannot be linearized inside ``lax.scan`` (jax 0.9), and both
    the GRU loop and the frame-BPTT loop here are scans. XLA fuses the shifted
    adds; for the 3×3/5×5 windows used this is as fast as reduce_window.
    """
    B, H, W, C = x.shape
    if padding:
        xp = jnp.pad(
            x, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=pad_value,
        )
    else:
        xp = x
    Hp, Wp = H + 2 * padding, W + 2 * padding
    Ho = (Hp - window) // stride + 1
    Wo = (Wp - window) // stride + 1
    for dv in range(window):
        for du in range(window):
            yield xp[:, dv : dv + (Ho - 1) * stride + 1 : stride,
                     du : du + (Wo - 1) * stride + 1 : stride]


def avg_pool(x: jax.Array, window: int, stride: int, padding: int) -> jax.Array:
    """``F.avg_pool2d(count_include_pad=True)`` on NHWC.

    Implemented as a depthwise convolution with a constant kernel: on TPU,
    XLA lowers strided window *slices* of a channel-minor tensor to per-pixel
    index gathers (measured 0.26 ms each for a 3×3/s2 pool of a 96×320×128
    hidden state — ~2.4 ms/step inside the GRU scan), while the equivalent
    depthwise conv goes through the native convolution emitter. Zero padding
    plus a constant 1/w² kernel reproduces ``count_include_pad=True`` exactly,
    and convolutions differentiate fine inside ``lax.scan``.
    """
    B, H, W, C = x.shape
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dtype)
    kernel = jnp.full((window, window, 1, C), 1.0 / (window * window), dtype)
    out = lax.conv_general_dilated(
        xf, kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out.astype(x.dtype)


def max_pool(x: jax.Array, window: int, stride: int, padding: int) -> jax.Array:
    """``F.max_pool2d`` on NHWC."""
    neg = float("-inf")
    out = None
    for s in _window_slices(x, window, stride, padding, neg):
        out = s if out is None else jnp.maximum(out, s)
    return out


def pool2x(x: jax.Array) -> jax.Array:
    """``core/update.py:114``: avg_pool2d(x, 3, stride=2, padding=1)."""
    return avg_pool(x, 3, 2, 1)


def pool4x(x: jax.Array) -> jax.Array:
    """``core/update.py:118``: avg_pool2d(x, 5, stride=4, padding=1)."""
    return avg_pool(x, 5, 4, 1)


@functools.cache
def _batcher_network(n: int):
    """Comparator list (i, j) of Batcher's odd-even mergesort for n wires
    (n must be a power of two). Applying min/max along each pair in order
    sorts n parallel arrays ascending."""
    assert n & (n - 1) == 0, n
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


def _select_rank(taps: list, rank: int) -> jax.Array:
    """rank-th smallest (0-based) across a list of same-shaped arrays, via a
    min/max sorting network — a chain of elementwise ops XLA fuses into one
    loop fusion, instead of ``jnp.sort`` over a size-n minor axis (an XLA
    ``sort`` HLO: measured 86 ms per call at train shapes vs ~0 fused).
    Wires are padded to a power of two with +inf, which preserves all
    ascending ranks below the original n."""
    n = len(taps)
    m = 1 << (n - 1).bit_length()
    taps = list(taps) + [
        jnp.full_like(taps[0], jnp.inf) for _ in range(m - n)
    ]
    for a, b in _batcher_network(m):
        lo = jnp.minimum(taps[a], taps[b])
        hi = jnp.maximum(taps[a], taps[b])
        taps[a], taps[b] = lo, hi
    return taps[rank]


def median_pool(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping k×k *lower*-median pooling (torch ``.median`` picks the
    element at sorted index ``(n-1)//2``).

    Reference: ``core/utils/utils.py:121`` (``MedianPool2d``) as used by the
    losses with kernel_size=stride=k, padding=0 (``train_stereo.py:46,72``).
    x: (B, H, W, C) with H % k == W % k == 0.
    """
    B, H, W, C = x.shape
    assert H % k == 0 and W % k == 0, (H, W, k)
    xw = x.reshape(B, H // k, k, W // k, k, C)
    taps = [xw[:, :, dv, :, du] for dv in range(k) for du in range(k)]
    return _select_rank(taps, (k * k - 1) // 2)


def median_filter(x: jax.Array, k: int = 3) -> jax.Array:
    """Overlapping k×k median filter, stride 1, reflect padding — the general
    ``MedianPool2d(k, 1, pad, same)`` case (reference utils.py:121; the
    non-overlapping loss path uses :func:`median_pool`). Torch lower-median."""
    B, H, W, C = x.shape
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, k - 1 - p), (p, k - 1 - p), (0, 0)),
                 mode="reflect")
    taps = [
        xp[:, dv : dv + H, du : du + W]
        for dv in range(k)
        for du in range(k)
    ]
    return _select_rank(taps, (k * k - 1) // 2)


def unfold3x3(x: jax.Array) -> jax.Array:
    """3×3 neighbourhood stack with zero padding.

    x: (B, H, W, C) → (B, H, W, 9, C) where index ``3*dv+du`` holds the value
    at (h+dv-1, w+du-1) — same tap ordering as ``F.unfold(x, [3,3], padding=1)``.
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dv in range(3):
        for du in range(3):
            taps.append(xp[:, dv : dv + H, du : du + W])
    return jnp.stack(taps, axis=3)


def replicate_pad(x: jax.Array, pads) -> jax.Array:
    """Replicate-pad NHWC tensor: pads = (left, right, top, bottom)."""
    l, r, t, b = pads
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def convex_upsample(field: jax.Array, mask_logits: jax.Array, factor: int,
                    scale: bool = True) -> jax.Array:
    """RAFT-style convex-combination upsampling.

    Reference: ``core/tc_stereo.py:75-88`` (``upsample_flow``).

    Args:
      field: (B, H, W, D) low-res field (e.g. flow).
      mask_logits: (B, H, W, 9*factor*factor) logits ordered as the reference's
        ``view(N, 1, 9, factor, factor, H, W)`` — i.e. channel index =
        ``(k*factor + fy)*factor + fx`` with k the 3×3 tap.
      factor: upsampling factor (2**n_downsample).
      scale: multiply field values by ``factor`` (for flows/disparities).

    Returns:
      (B, factor*H, factor*W, D).
    """
    B, H, W, D = field.shape
    m = mask_logits.reshape(B, H, W, 9, factor, factor)
    m = jax.nn.softmax(m, axis=3)

    f = field * factor if scale else field
    neighbours = unfold3x3(f)  # (B, H, W, 9, D)

    # (B, H, W, fy, fx, D)
    up = jnp.einsum("bhwkyx,bhwkd->bhwyxd", m, neighbours)
    # → (B, H, fy, W, fx, D) → (B, H*fy, W*fx, D)
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(B, H * factor, W * factor, D)
