"""Pinhole geometry and pose-based temporal warping (pure jnp, NHWC).

TPU-native equivalent of the reference's ``core/utils/geo_utils.py``. All maps
are (B, H, W, C); intrinsics are (B, 3, 3); poses are world→camera (B, 4, 4);
baselines are (B,).

Components (reference file:line):
- ``disp2depth`` / ``depth2disp``                 — geo_utils.py:7,19
- ``pixel2point`` / ``point2pixel``               — geo_utils.py:32,45
- ``relative_transform`` / ``cal_relative_transformation`` — geo_utils.py:135,148
- ``disp2disp_gradient_xy`` / ``disp2disp_normal_xy``       — geo_utils.py:115,104
- ``disp2disp_grad_candidates``                   — geo_utils.py:73
- ``warp`` (forward temporal splat-warp)          — geo_utils.py:158
- ``get_backward_grid``                           — geo_utils.py:201
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tcs_tpu.ops.sampler import coords_grid
from tcs_tpu.ops.splat import softsplat


def disp2depth(disp: jax.Array, baseline: jax.Array, fx: jax.Array) -> jax.Array:
    """depth = baseline*fx / clip(disp, 0.001). disp: (B,H,W,1)."""
    bf = (baseline * fx).reshape(-1, 1, 1, 1)
    return bf / jnp.clip(disp, 0.001, None)


def depth2disp(depth: jax.Array, baseline: jax.Array, fx: jax.Array) -> jax.Array:
    """disp = baseline*fx / depth; non-finite → -1 (reference geo_utils.py:28)."""
    bf = (baseline * fx).reshape(-1, 1, 1, 1)
    disp = bf / depth
    bad = jnp.isnan(disp) | jnp.isinf(disp)
    return jnp.where(bad, -jnp.ones_like(disp), disp)


def pixel2point(depth: jax.Array, K_inv: jax.Array) -> jax.Array:
    """Back-project depth to camera-space 3D points.

    depth: (B,H,W,1), K_inv: (B,3,3) → (B,H,W,3).
    """
    B, H, W, _ = depth.shape
    grid = coords_grid(B, H, W, depth.dtype)  # (B,H,W,2) (x,y)
    homo = jnp.concatenate([grid, jnp.ones_like(depth)], axis=-1)  # (B,H,W,3)
    rays = jnp.einsum("bij,bhwj->bhwi", K_inv, homo)
    return depth * rays


def point2pixel(point: jax.Array, depth: jax.Array, K: jax.Array) -> jax.Array:
    """Project 3D points to pixels: (K @ P) / depth; non-finite → -1.

    point: (B,H,W,3), depth: (B,H,W,1), K: (B,3,3) → (B,H,W,2).
    """
    proj = jnp.einsum("bij,bhwj->bhwi", K, point) / depth
    bad = jnp.isnan(proj) | jnp.isinf(proj)
    proj = jnp.where(bad, -jnp.ones_like(proj), proj)
    return proj[..., :2]


def relative_transform(x: jax.Array, relative_T: jax.Array) -> jax.Array:
    """Apply a rigid transform to points. x: (B,H,W,3), T: (B,4,4)."""
    R = relative_T[:, :3, :3]
    t = relative_T[:, :3, 3]
    return jnp.einsum("bij,bhwj->bhwi", R, x) + t[:, None, None, :]


def cal_relative_transformation(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """Relative transform from camera-1 space to camera-2 space: T2 @ inv(T1).

    T1, T2: world→cam (B,4,4). Reference geo_utils.py:148.
    """
    return jnp.matmul(T2, jnp.linalg.inv(T1))


def scale_intrinsics(K: jax.Array, scale: float) -> jax.Array:
    """Scale fx, fy, cx, cy rows by ``scale`` (reference tc_stereo.py:122)."""
    s = jnp.array([scale, scale, 1.0], K.dtype).reshape(1, 3, 1)
    return K * s


def disp2disp_gradient_xy(disp: jax.Array):
    """Forward-difference x/y disparity gradients with replicate padding.

    disp: (..., H, W, 1) → grads (..., H, W, 2) channels (gx, gy), edge_mask
    (..., H, W, 1) true where |gx|<5 and |gy|<5. Reference geo_utils.py:115.
    Supports arbitrary leading dims (e.g. stacked per-iteration predictions).
    """
    nb = disp.ndim - 3
    pads = ((0, 0),) * nb + ((1, 1), (1, 1), (0, 0))
    dp = jnp.pad(disp, pads, mode="edge")
    H, W = disp.shape[-3], disp.shape[-2]
    center = dp[..., 1 : 1 + H, 1 : 1 + W, :]
    gx = dp[..., 1 : 1 + H, 2 : 2 + W, :] - center
    gy = dp[..., 2 : 2 + H, 1 : 1 + W, :] - center
    grads = jnp.concatenate([gx, gy], axis=-1)
    edge_mask = (jnp.abs(gx) < 5) & (jnp.abs(gy) < 5)
    return grads, edge_mask


def disp2disp_normal_xy(disp: jax.Array):
    """Gradient → unit normal (gx, gy, -1)/‖·‖. Reference geo_utils.py:104."""
    grads, edge_mask = disp2disp_gradient_xy(disp)
    normal = jnp.concatenate([grads, -jnp.ones_like(grads[..., :1])], axis=-1)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    return normal, edge_mask

# 8-neighbour offsets in the reference's kernel order (v, u) relative to the
# 3x3 window; geo_utils.py:83.
_NEIGHBOUR_VUS = ((0, 0), (0, 1), (0, 2), (1, 2), (2, 2), (2, 1), (2, 0), (1, 0))


def disp2disp_grad_candidates(disp: jax.Array, level: int = 2) -> jax.Array:
    """Plane-gradient candidates from cross products of neighbour differences.

    For each of ``level`` dilations and 8 directions, compute the 3-vector
    difference (Δx, Δy, Δd) from centre to neighbour; cross consecutive-pair
    directions (roll −2) to get plane normals; return −(nx, ny)/nz.

    disp: (B,H,W,1) → (B,H,W, 8*level, 2). Reference geo_utils.py:73.
    """
    B, H, W, _ = disp.shape
    diffs = []  # each (B,H,W,3): (dx, dy, dd) neighbour − centre
    for i in range(level):
        d = i + 1  # dilation
        dp = jnp.pad(disp, ((0, 0), (d, d), (d, d), (0, 0)))
        centre = dp[:, d : d + H, d : d + W]
        for v, u in _NEIGHBOUR_VUS:
            dv = (v - 1) * d
            du = (u - 1) * d
            nb = dp[:, d + dv : d + dv + H, d + du : d + du + W]
            # Coordinate difference = neighbour coord − centre coord = (du, dv).
            dx = jnp.full_like(centre, float(du))
            dy = jnp.full_like(centre, float(dv))
            diffs.append(jnp.concatenate([dx, dy, nb - centre], axis=-1))
    vecs = jnp.stack(diffs, axis=3)  # (B,H,W, 8*level, 3)
    vecs_roll = jnp.roll(vecs, shift=-2, axis=3)
    cross = jnp.cross(vecs, vecs_roll)  # (B,H,W,8*level,3)
    return -cross[..., :2] / cross[..., 2:]


def _reproject_components(disp, relative_T, K, K_inv, baseline,
                          clip_disp_min=None):
    """Pinhole reprojection in scalar-component form.

    Same math as disp2depth → pixel2point → relative_transform (the generic
    (B,H,W,3)/einsum helpers above), but carried as separate (B,H,W) planes:
    2/3-channel minor dims drive XLA into badly-tiled layouts on TPU (the
    same disease fixed in ops/sampler.bilinear_sampler), while full
    (B,H,W) planes stay on clean (8,128) tiles.

    Returns (X, Y, Z) current-frame camera-space coordinates, each (B,H,W).
    """
    B, H, W, _ = disp.shape
    d = disp[..., 0]
    if clip_disp_min is not None:
        d = jnp.clip(d, clip_disp_min, None)
    fx = K[:, 0, 0]
    bf = (baseline * fx)[:, None, None]
    depth = bf / jnp.clip(d, 0.001, None)

    xg = lax.broadcasted_iota(disp.dtype, (B, H, W), 2)
    yg = lax.broadcasted_iota(disp.dtype, (B, H, W), 1)

    def kv(M, i, j):
        return M[:, i, j][:, None, None]

    rx = kv(K_inv, 0, 0) * xg + kv(K_inv, 0, 1) * yg + kv(K_inv, 0, 2)
    ry = kv(K_inv, 1, 0) * xg + kv(K_inv, 1, 1) * yg + kv(K_inv, 1, 2)
    rz = kv(K_inv, 2, 0) * xg + kv(K_inv, 2, 1) * yg + kv(K_inv, 2, 2)
    X0, Y0, Z0 = depth * rx, depth * ry, depth * rz

    T = relative_T
    X = kv(T, 0, 0) * X0 + kv(T, 0, 1) * Y0 + kv(T, 0, 2) * Z0 + kv(T, 0, 3)
    Y = kv(T, 1, 0) * X0 + kv(T, 1, 1) * Y0 + kv(T, 1, 2) * Z0 + kv(T, 1, 3)
    Z = kv(T, 2, 0) * X0 + kv(T, 2, 1) * Y0 + kv(T, 2, 2) * Z0 + kv(T, 2, 3)
    return X, Y, Z


def _project_pixels(X, Y, Z, K):
    """Component-form point2pixel: (u, v) = (K·P)/Z with non-finite → −1."""

    def kv(i, j):
        return K[:, i, j][:, None, None]

    u = (kv(0, 0) * X + kv(0, 1) * Y + kv(0, 2) * Z) / Z
    v = (kv(1, 0) * X + kv(1, 1) * Y + kv(1, 2) * Z) / Z
    ub = jnp.isnan(u) | jnp.isinf(u)
    vb = jnp.isnan(v) | jnp.isinf(v)
    return (jnp.where(ub, -jnp.ones_like(u), u),
            jnp.where(vb, -jnp.ones_like(v), v))


def warp(disp: jax.Array, fmap: jax.Array, relative_T: jax.Array,
         K: jax.Array, K_inv: jax.Array, baseline: jax.Array,
         feature_dtype=jnp.float32, splat_backend: str = "xla"):
    """Forward-warp previous-frame disparity + features to the current frame.

    disp→depth→3D point→rigid transform→reproject; softmax-splat (disp, fmap)
    along the induced 2D flow with metric clamp(disp − mean, ±50).

    Reference geo_utils.py:158. All outputs are gradient-stopped, matching the
    ``.detach()`` in the reference.

    ``feature_dtype=bfloat16`` splats the C-channel feature block in bf16
    (halving the dominant scatter traffic) while keeping the disparity /
    validity scatter fp32 — the warped features only feed an L2-normalised
    cosine cost, where bf16 rounding is negligible; exp(±50) metrics stay in
    bf16 range. Disparity keeps full precision either way.

    Returns (current_disp (B,H,W,1), current_fmap (B,H,W,C), mask (B,H,W,1)).
    """
    B, H, W, _ = disp.shape
    fx = K[:, 0, 0]
    X, Y, Z = _reproject_components(disp, relative_T, K, K_inv, baseline)
    cur_depth = Z[..., None]
    cur_disp = depth2disp(cur_depth, baseline, fx)
    valid = ((cur_disp > 0) & (cur_disp < W)).astype(disp.dtype)

    u, v = _project_pixels(X, Y, Z, K)
    xg = lax.broadcasted_iota(disp.dtype, (B, H, W), 2)
    yg = lax.broadcasted_iota(disp.dtype, (B, H, W), 1)
    forward_flow = jnp.stack([u - xg, v - yg], axis=-1)

    metric = jnp.clip(cur_disp - jnp.mean(cur_disp, axis=(1, 2, 3), keepdims=True), -50.0, 50.0)
    if jnp.dtype(feature_dtype) == jnp.float32:
        feats = jnp.concatenate([cur_disp, fmap], axis=-1)
        splatted, mask = softsplat(feats, forward_flow, metric,
                                   mode="soft-clipeps", valid_mask=valid,
                                   backend=splat_backend)
        out_disp = splatted[..., :1]
        out_fmap = splatted[..., 1:]
    else:
        dt = jnp.dtype(feature_dtype)
        out_disp, mask = softsplat(cur_disp, forward_flow, metric,
                                   mode="soft-clipeps", valid_mask=valid,
                                   backend=splat_backend)
        out_fmap, _ = softsplat(fmap.astype(dt), forward_flow.astype(dt),
                                metric.astype(dt), mode="soft-clipeps",
                                valid_mask=valid.astype(dt),
                                backend=splat_backend)
        out_fmap = out_fmap.astype(jnp.float32)
    return (
        jax.lax.stop_gradient(out_disp),
        jax.lax.stop_gradient(out_fmap),
        jax.lax.stop_gradient(mask),
    )


def get_backward_grid(disp: jax.Array, relative_T: jax.Array, K: jax.Array,
                      K_inv: jax.Array, baseline: jax.Array) -> jax.Array:
    """Sampling grid mapping current-frame pixels into the previous frame.

    disp: (B,H,W,1) current disparity (clipped ≥0.01); relative_T: current →
    previous. Invalid (behind-camera) pixels map to −1. Reference
    geo_utils.py:201. Returns (B,H,W,2) pixel coords.
    """
    X, Y, Z = _reproject_components(disp, relative_T, K, K_inv, baseline,
                                    clip_disp_min=0.01)
    u, v = _project_pixels(X, Y, Z, K)
    valid = Z > 0
    neg1 = -jnp.ones_like(u)
    return jnp.stack([jnp.where(valid, u, neg1),
                      jnp.where(valid, v, neg1)], axis=-1)
