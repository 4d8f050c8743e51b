"""Unit tests for tcs_tpu.ops.sampler against torch oracles.

torch (CPU) is used purely as a numerical oracle for the semantics the
reference relies on (grid_sample / interpolate / avg_pool2d / median).
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tcs_tpu.ops import sampler


def to_torch_nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def from_torch_nchw(t):
    return t.permute(0, 2, 3, 1).numpy()


def test_coords_grid():
    g = sampler.coords_grid(2, 3, 4)
    assert g.shape == (2, 3, 4, 2)
    np.testing.assert_allclose(g[0, 1, 2], [2.0, 1.0])
    np.testing.assert_allclose(g[1, 0, 3], [3.0, 0.0])


def test_bilinear_sampler_matches_grid_sample(rng):
    B, H, W, C = 2, 7, 9, 3
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # Coordinates both inside and outside the image.
    coords = rng.uniform(-2, max(H, W) + 1, size=(B, 5, 6, 2)).astype(np.float32)

    ours = sampler.bilinear_sampler(jnp.asarray(img), jnp.asarray(coords))

    timg = to_torch_nchw(img)
    x = torch.from_numpy(coords[..., 0])
    y = torch.from_numpy(coords[..., 1])
    gx = 2 * x / (W - 1) - 1
    gy = 2 * y / (H - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    ref = F.grid_sample(timg, grid, align_corners=True, padding_mode="zeros")
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-5)


def test_resize_bilinear_matches_interpolate(rng):
    x = rng.normal(size=(2, 6, 8, 3)).astype(np.float32)
    for out_hw in [(12, 16), (3, 4), (6, 8), (13, 5)]:
        ours = sampler.resize_bilinear(jnp.asarray(x), out_hw)
        ref = F.interpolate(
            to_torch_nchw(x), size=out_hw, mode="bilinear", align_corners=True
        )
        np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-5)


def test_resize_nearest_matches_interpolate(rng):
    x = rng.normal(size=(2, 8, 12, 2)).astype(np.float32)
    for out_hw in [(2, 3), (4, 6), (16, 24)]:
        ours = sampler.resize_nearest(jnp.asarray(x), out_hw)
        ref = F.interpolate(to_torch_nchw(x), size=out_hw, mode="nearest")
        np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-6)


def test_upflow(rng):
    x = rng.normal(size=(1, 4, 5, 1)).astype(np.float32)
    ours = sampler.upflow(jnp.asarray(x), 4)
    ref = 4 * F.interpolate(
        to_torch_nchw(x), size=(16, 20), mode="bilinear", align_corners=True
    )
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-5)


def test_pool2x_matches_avg_pool(rng):
    for H, W in [(8, 10), (7, 9)]:
        x = rng.normal(size=(2, H, W, 4)).astype(np.float32)
        ours = sampler.pool2x(jnp.asarray(x))
        ref = F.avg_pool2d(to_torch_nchw(x), 3, stride=2, padding=1)
        np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-5)


def test_pool4x_matches_avg_pool(rng):
    x = rng.normal(size=(1, 12, 16, 2)).astype(np.float32)
    ours = sampler.pool4x(jnp.asarray(x))
    ref = F.avg_pool2d(to_torch_nchw(x), 5, stride=4, padding=1)
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-5)


def test_max_pool(rng):
    x = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    ours = sampler.max_pool(jnp.asarray(x), 4, 4, 0)
    ref = F.max_pool2d(to_torch_nchw(x), 4, 4, 0)
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-6)


def test_median_pool_matches_torch_lower_median(rng):
    x = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
    ours = sampler.median_pool(jnp.asarray(x), 4)
    t = to_torch_nchw(x)
    tu = t.unfold(2, 4, 4).unfold(3, 4, 4)
    ref = tu.contiguous().view(*tu.shape[:4], -1).median(dim=-1)[0]
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-6)


def test_unfold3x3(rng):
    x = rng.normal(size=(1, 5, 6, 2)).astype(np.float32)
    ours = sampler.unfold3x3(jnp.asarray(x))  # (B,H,W,9,C)
    ref = F.unfold(to_torch_nchw(x), [3, 3], padding=1)  # (B, C*9, H*W)
    ref = ref.view(1, 2, 9, 5, 6).permute(0, 3, 4, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_convex_upsample_matches_reference_semantics(rng):
    """Oracle reimplements tc_stereo.py:75-88 upsample_flow in torch."""
    B, H, W, D, factor = 2, 4, 5, 1, 4
    flow = rng.normal(size=(B, H, W, D)).astype(np.float32)
    mask = rng.normal(size=(B, H, W, 9 * factor * factor)).astype(np.float32)

    ours = sampler.convex_upsample(jnp.asarray(flow), jnp.asarray(mask), factor)

    tflow = to_torch_nchw(flow)
    tmask = to_torch_nchw(mask)
    m = tmask.view(B, 1, 9, factor, factor, H, W)
    m = torch.softmax(m - m.max(dim=2, keepdim=True)[0], dim=2)
    up = F.unfold(factor * tflow, [3, 3], padding=1).view(B, D, 9, 1, 1, H, W)
    up = torch.sum(m * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(B, D, factor * H, factor * W)
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(up), atol=1e-5)


def test_replicate_pad(rng):
    x = rng.normal(size=(1, 3, 4, 2)).astype(np.float32)
    ours = sampler.replicate_pad(jnp.asarray(x), (1, 2, 3, 4))
    ref = F.pad(to_torch_nchw(x), (1, 2, 3, 4), mode="replicate")
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-6)


def test_median_filter_matches_torch_unfold(rng):
    from tcs_tpu.ops.sampler import median_filter

    x = rng.normal(size=(1, 6, 7, 2)).astype(np.float32)
    ours = median_filter(jnp.asarray(x), 3)
    t = to_torch_nchw(x)
    tp = F.pad(t, (1, 1, 1, 1), mode="reflect")
    tu = tp.unfold(2, 3, 1).unfold(3, 3, 1)
    ref = tu.contiguous().view(*tu.shape[:4], -1).median(dim=-1)[0]
    np.testing.assert_allclose(np.asarray(ours), from_torch_nchw(ref), atol=1e-6)


def test_select_rank_matches_np_sort(rng):
    """The min/max selection network (used by both medians) returns the exact
    rank-th smallest for every rank, including non-power-of-two tap counts."""
    from tcs_tpu.ops.sampler import _select_rank

    for n in (2, 3, 9, 16, 25):
        taps = [rng.normal(size=(2, 5, 7)).astype(np.float32) for _ in range(n)]
        stacked = np.sort(np.stack(taps, axis=-1), axis=-1)
        for rank in {0, (n - 1) // 2, n - 1}:
            got = np.asarray(_select_rank([jnp.asarray(t) for t in taps], rank))
            np.testing.assert_array_equal(got, stacked[..., rank])
