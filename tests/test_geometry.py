"""Unit tests for tcs_tpu.geometry (closed-form cases + torch oracles)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tcs_tpu import geometry
from tcs_tpu.ops.sampler import coords_grid


def make_K(B=1, fx=100.0, fy=100.0, cx=16.0, cy=12.0):
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    return np.broadcast_to(K, (B, 3, 3)).copy()


def test_disp_depth_roundtrip(rng):
    disp = rng.uniform(1.0, 50.0, size=(2, 4, 5, 1)).astype(np.float32)
    baseline = np.array([0.5, 0.25], np.float32)
    fx = np.array([100.0, 320.0], np.float32)
    depth = geometry.disp2depth(jnp.asarray(disp), jnp.asarray(baseline), jnp.asarray(fx))
    disp2 = geometry.depth2disp(depth, jnp.asarray(baseline), jnp.asarray(fx))
    np.testing.assert_allclose(np.asarray(disp2), disp, rtol=1e-5)


def test_pixel_point_roundtrip(rng):
    K = make_K(B=2)
    K_inv = np.linalg.inv(K)
    depth = rng.uniform(1.0, 10.0, size=(2, 6, 8, 1)).astype(np.float32)
    P = geometry.pixel2point(jnp.asarray(depth), jnp.asarray(K_inv))
    pix = geometry.point2pixel(P, jnp.asarray(depth), jnp.asarray(K))
    grid = coords_grid(2, 6, 8)
    np.testing.assert_allclose(np.asarray(pix), np.asarray(grid), atol=1e-4)
    # Depth channel of P is the input depth.
    np.testing.assert_allclose(np.asarray(P[..., 2:3]), depth, rtol=1e-6)


def test_relative_transform_translation():
    x = np.zeros((1, 2, 2, 3), np.float32)
    T = np.eye(4, dtype=np.float32)[None].copy()
    T[0, :3, 3] = [1.0, 2.0, 3.0]
    out = geometry.relative_transform(jnp.asarray(x), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [1.0, 2.0, 3.0], atol=1e-6)


def test_cal_relative_transformation():
    rng = np.random.default_rng(0)
    # random rigid transforms
    def rand_T():
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        T = np.eye(4)
        T[:3, :3] = Q
        T[:3, 3] = rng.normal(size=3)
        return T.astype(np.float32)

    T1, T2 = rand_T()[None], rand_T()[None]
    rel = np.asarray(geometry.cal_relative_transformation(jnp.asarray(T1), jnp.asarray(T2)))
    np.testing.assert_allclose(rel @ T1, T2, atol=1e-5)


def test_disp_gradient_xy(rng):
    # Linear ramp disp = 2x + 3y → gx=2, gy=3 (except at right/bottom edges
    # where replicate padding zeroes the forward difference).
    H, W = 5, 6
    g = np.asarray(coords_grid(1, H, W))
    disp = (2 * g[..., 0:1] + 3 * g[..., 1:2]).astype(np.float32)
    grads, mask = geometry.disp2disp_gradient_xy(jnp.asarray(disp))
    grads = np.asarray(grads)
    np.testing.assert_allclose(grads[0, : H - 1, : W - 1, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(grads[0, : H - 1, : W - 1, 1], 3.0, atol=1e-6)
    np.testing.assert_allclose(grads[0, :, W - 1, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(grads[0, H - 1, :, 1], 0.0, atol=1e-6)


def test_disp_normal_unit_norm(rng):
    disp = rng.normal(size=(1, 6, 6, 1)).astype(np.float32)
    normal, _ = geometry.disp2disp_normal_xy(jnp.asarray(disp))
    norms = np.linalg.norm(np.asarray(normal), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_grad_candidates_match_reference_semantics(rng):
    """Oracle: reimplementation of geo_utils.py:73-101 with torch convs."""
    disp = rng.normal(size=(2, 6, 8, 1)).astype(np.float32) * 3
    ours = np.asarray(geometry.disp2disp_grad_candidates(jnp.asarray(disp), level=2))

    # torch oracle
    t_disp = torch.from_numpy(disp).permute(0, 3, 1, 2)
    N, _, H, W = t_disp.shape
    kernel = torch.zeros((8, 1, 3, 3))
    kernel[:, :, 1, 1] = -1
    vus = [(0, 0), (0, 1), (0, 2), (1, 2), (2, 2), (2, 1), (2, 0), (1, 0)]
    for i, (v, u) in enumerate(vus):
        kernel[i, :, v, u] += 1
    cands = []
    for i in range(2):
        pad = 1 + i
        dpad = F.pad(t_disp, (pad, pad, pad, pad))
        ys, xs = torch.meshgrid(
            torch.arange(H + 2 * pad, dtype=torch.float32),
            torch.arange(W + 2 * pad, dtype=torch.float32),
            indexing="ij",
        )
        coord = torch.stack([xs, ys])[None].repeat(N, 1, 1, 1)
        cd = torch.cat([coord, dpad], dim=1).reshape(-1, 1, H + 2 * pad, W + 2 * pad)
        grads = F.conv2d(cd.repeat(1, 8, 1, 1), kernel, groups=8, dilation=i + 1)
        cands.append(grads.reshape(N, 3, 8, H, W))
    grads = torch.cat(cands, dim=2)
    grads_roll = torch.roll(grads, shifts=-2, dims=2)
    cross = torch.cross(grads, grads_roll, dim=1)
    ref = (-cross[:, :2] / cross[:, 2:]).permute(0, 3, 4, 2, 1).numpy()  # (N,H,W,16,2)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_grad_candidates_planar_disparity():
    """For disp = a·x + b·y + c, all plane-gradient candidates equal (a, b)."""
    H, W = 8, 10
    g = np.asarray(coords_grid(1, H, W))
    a, b = 0.3, -0.2
    disp = (a * g[..., 0:1] + b * g[..., 1:2] + 5).astype(np.float32)
    cands = np.asarray(geometry.disp2disp_grad_candidates(jnp.asarray(disp), level=2))
    # interior pixels (away from zero padding): dilation ≤ 2 → margin 2
    inner = cands[:, 2:-2, 2:-2]
    np.testing.assert_allclose(inner[..., 0], a, atol=1e-4)
    np.testing.assert_allclose(inner[..., 1], b, atol=1e-4)


def test_warp_identity_pose(rng):
    """Identity relative pose ⇒ zero flow ⇒ disp/fmap unchanged (valid px)."""
    B, H, W = 1, 8, 10
    disp = rng.uniform(2.0, 8.0, size=(B, H, W, 1)).astype(np.float32)
    fmap = rng.normal(size=(B, H, W, 4)).astype(np.float32)
    K = make_K(B, fx=50.0, fy=50.0, cx=W / 2, cy=H / 2)
    K_inv = np.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)[None]
    baseline = np.array([0.5], np.float32)
    out_disp, out_fmap, mask = geometry.warp(
        jnp.asarray(disp), jnp.asarray(fmap), jnp.asarray(T),
        jnp.asarray(K), jnp.asarray(K_inv), jnp.asarray(baseline)
    )
    np.testing.assert_allclose(np.asarray(mask), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_disp), disp, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_fmap), fmap, atol=1e-3)


def test_backward_grid_identity_pose(rng):
    B, H, W = 1, 6, 8
    disp = rng.uniform(1.0, 5.0, size=(B, H, W, 1)).astype(np.float32)
    K = make_K(B, fx=50.0, fy=50.0, cx=W / 2, cy=H / 2)
    K_inv = np.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)[None]
    baseline = np.array([0.5], np.float32)
    grid = geometry.get_backward_grid(
        jnp.asarray(disp), jnp.asarray(T), jnp.asarray(K), jnp.asarray(K_inv),
        jnp.asarray(baseline)
    )
    np.testing.assert_allclose(np.asarray(grid), np.asarray(coords_grid(B, H, W)), atol=1e-4)


def test_backward_grid_pure_x_translation():
    """Camera translates along +x by t ⇒ previous pixel x' = x + fx*t/z."""
    B, H, W = 1, 6, 8
    disp = np.full((B, H, W, 1), 4.0, np.float32)
    fx = 50.0
    baseline = np.array([0.5], np.float32)
    K = make_K(B, fx=fx, fy=fx, cx=W / 2, cy=H / 2)
    K_inv = np.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)[None].copy()
    tx = 0.1
    T[0, 0, 3] = tx
    grid = np.asarray(geometry.get_backward_grid(
        jnp.asarray(disp), jnp.asarray(T), jnp.asarray(K), jnp.asarray(K_inv),
        jnp.asarray(baseline)
    ))
    z = baseline[0] * fx / 4.0
    expected_shift = fx * tx / z
    base = np.asarray(coords_grid(B, H, W))
    np.testing.assert_allclose(grid[..., 0] - base[..., 0], expected_shift, atol=1e-4)
    np.testing.assert_allclose(grid[..., 1], base[..., 1], atol=1e-4)


def test_warp_bf16_features_close_to_fp32(rng):
    """bf16 feature-splat path: disparity/mask bit-identical to fp32 (they
    stay fp32), warped features within bf16 rounding of the fp32 splat."""
    B, H, W = 1, 8, 10
    disp = rng.uniform(2.0, 8.0, size=(B, H, W, 1)).astype(np.float32)
    fmap = rng.normal(size=(B, H, W, 16)).astype(np.float32)
    K = make_K(B, fx=50.0, fy=50.0, cx=W / 2, cy=H / 2)
    K_inv = np.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)[None].copy()
    T[0, 0, 3] = 0.03  # small translation → non-trivial flow
    baseline = np.array([0.5], np.float32)
    args = (jnp.asarray(disp), jnp.asarray(fmap), jnp.asarray(T),
            jnp.asarray(K), jnp.asarray(K_inv), jnp.asarray(baseline))
    d32, f32_, m32 = geometry.warp(*args, feature_dtype=jnp.float32)
    d16, f16, m16 = geometry.warp(*args, feature_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(d32), np.asarray(d16))
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(m16))
    assert f16.dtype == jnp.float32
    scale = np.maximum(np.abs(np.asarray(f32_)), 1.0)
    close = np.isclose(np.asarray(f16) / scale, np.asarray(f32_) / scale,
                       atol=0.05)
    # Cells whose splat-weight sum is ~eps normalise to garbage in both
    # precisions (and differ); everywhere else bf16 tracks fp32.
    assert close.mean() > 0.99, f"only {close.mean():.4f} close"
