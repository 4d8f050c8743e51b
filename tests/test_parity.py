"""Full-model numerics A/B against the reference implementation.

Builds the reference torch TCStereo (imported read-only from /root/reference
as a test oracle, with its cupy-only CUDA splat stubbed out — the first-frame
path never calls it), copies its randomly initialised weights through
``tools/convert_torch_ckpt.convert_state_dict`` into the tcs_tpu model, and
checks the two forward passes agree on the same input.

This validates, in one shot: the converter's name/layout mapping, every
layer's torch-semantics parity (convs, norms, GRUs, lookup, argmax bootstrap,
completion, dual-space refinement, convex upsampling) and the test-mode
output plumbing.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def torch_reference():
    import torch

    cupy = types.ModuleType("cupy")

    def memoize(**kw):
        def deco(f):
            return f

        return deco

    cupy.memoize = memoize
    sys.modules.setdefault("cupy", cupy)
    sys.path.insert(0, REFERENCE)
    import argparse

    from core.tc_stereo import TCStereo as TorchTCStereo

    args = argparse.Namespace(
        hidden_dims=[128, 128, 128], corr_levels=4, corr_radius=4,
        n_downsample=2, n_gru_layers=3, context_norm="none",
        shared_backbone=True, slow_fast_gru=False, mixed_precision=False,
        init_thres=0.5,
    )
    torch.manual_seed(7)
    model = TorchTCStereo(args)
    model.eval()
    return model


def _softsplat_cpu(tenIn, tenFlow, tenMetric, strMode, valid_mask=None):
    """CPU torch re-implementation of the reference softsplat forward.

    Mirrors the wrapper (softsplat.py:232-274, 'soft-clipeps' mode) and the
    CUDA ``softsplat_out`` kernel (softsplat.py:284-345): bilinear scatter-add
    of exp(metric)-weighted values + a weight channel into the 4 in-bounds
    neighbour cells, then normalize by the clipped weight channel. Forward
    only — the parity tests run the reference under ``torch.no_grad``.
    """
    import torch

    assert strMode == "soft-clipeps"
    if valid_mask is None:
        valid_mask = tenIn.new_ones(tenIn.shape[0], 1, *tenIn.shape[2:])
    tenIn = tenIn * valid_mask
    tenIn = torch.cat([tenIn * tenMetric.exp(), tenMetric.exp() * valid_mask], 1)

    B, C, H, W = tenIn.shape
    out = tenIn.new_zeros(B, C, H, W)
    ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    fltX = xs[None].float() + tenFlow[:, 0]
    fltY = ys[None].float() + tenFlow[:, 1]
    finite = torch.isfinite(fltX) & torch.isfinite(fltY)
    fltX = torch.where(finite, fltX, torch.full_like(fltX, -10.0))
    fltY = torch.where(finite, fltY, torch.full_like(fltY, -10.0))
    x0 = torch.floor(fltX).long()
    y0 = torch.floor(fltY).long()
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            wx = (fltX - x0.float()) if dx else (x0.float() + 1.0 - fltX)
            wy = (fltY - y0.float()) if dy else (y0.float() + 1.0 - fltY)
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & finite
            for b in range(B):
                m = inb[b]
                if not m.any():
                    continue
                idx = (yi[b][m] * W + xi[b][m])
                vals = tenIn[b].reshape(C, -1)[:, m.reshape(-1)] * (wx * wy)[b][m]
                out[b].view(C, -1).index_add_(1, idx, vals)

    tenNormalize = out[:, -1:]
    mask = (tenNormalize != 0).float()
    tenNormalize = tenNormalize.clip(0.0000001, None)
    return out[:, :-1] / tenNormalize, mask


def test_forward_parity_first_frame(torch_reference):
    import torch

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tools.convert_torch_ckpt import convert_state_dict

    B, H, W = 1, 64, 96
    iters = 2
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)

    # --- reference forward (first frame, test mode) ---
    with torch.no_grad():
        t_out = torch_reference(
            torch.from_numpy(img1).permute(0, 3, 1, 2),
            torch.from_numpy(img2).permute(0, 3, 1, 2),
            iters=iters, params=None, test_mode=True,
        )
    ref_flow = t_out["flow"].permute(0, 2, 3, 1).numpy()
    ref_flow_q = t_out["flow_q"].permute(0, 2, 3, 1).numpy()

    # --- convert weights and run tcs_tpu ---
    sd = {k: v.numpy() for k, v in torch_reference.state_dict().items()}
    params = convert_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32",
                      argmax_margin=0.3)  # inference threshold (corr.py:73)
    model = TCStereo(cfg=cfg)
    state = TemporalState.zeros(B, H, W, cfg)
    K = np.broadcast_to(
        np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()
    cam = CameraParams(K=jnp.asarray(K), baseline=jnp.full((B,), 0.5))
    out = model.apply(params, jnp.asarray(img1), jnp.asarray(img2), state,
                      cam, jnp.eye(4)[None], iters=iters, test_mode=True)

    our_flow = np.asarray(out.flow)
    our_flow_q = -np.asarray(out.new_state.disp_q)

    # structure check: converted tree must exactly match a fresh init tree
    fresh = model.init(jax.random.PRNGKey(0), jnp.asarray(img1),
                       jnp.asarray(img2), state, cam, jnp.eye(4)[None],
                       iters=1, test_mode=False)
    fresh_paths = {jax.tree_util.keystr(k): v.shape
                   for k, v in jax.tree_util.tree_leaves_with_path(fresh)}
    conv_paths = {jax.tree_util.keystr(k): v.shape
                  for k, v in jax.tree_util.tree_leaves_with_path(params)}
    assert fresh_paths == conv_paths

    assert our_flow.shape == ref_flow.shape
    err = np.abs(our_flow - ref_flow)
    assert err.max() < 5e-2, (err.max(), err.mean())
    err_q = np.abs(our_flow_q - ref_flow_q)
    assert err_q.max() < 5e-2, (err_q.max(), err_q.mean())


def test_forward_parity_second_frame(torch_reference):
    """A/B the TEMPORAL (frame >= 2) path against the torch reference.

    Exercises everything the first-frame test cannot: the pose-based forward
    warp (geo_utils.py:158-198, softsplat stubbed with a CPU torch equivalent
    of the CUDA kernel), the warped-feature cosine cost (tc_stereo.py:139-140),
    the completor on warped input, the hidden-state backward warp +
    per-level grid halving (tc_stereo.py:154-163) and the LightFuse fusion of
    a NONZERO warped hidden state (tc_stereo.py:168) — with nonzero relative
    rotation + translation between the frames.
    """
    import torch

    import core.utils.geo_utils as geo_utils_ref

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tools.convert_torch_ckpt import convert_state_dict

    geo_utils_ref.softsplat = _softsplat_cpu

    B, H, W = 1, 64, 96
    iters = 2
    rng = np.random.default_rng(3)
    img1a, img2a, img1b, img2b = (
        rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)
        for _ in range(4)
    )

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)[None]
    baseline = np.array([0.5], np.float32)
    T1 = np.eye(4, dtype=np.float32)[None]
    ang = 0.01  # ~0.6 deg yaw + small translation: realistic ego-motion
    R = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, :3] = R
    T2[:3, 3] = [0.05, 0.02, -0.10]
    T2 = T2[None]

    def nchw(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)

    with torch.no_grad():
        o1 = torch_reference(nchw(img1a), nchw(img2a), iters=iters,
                             params=None, test_mode=True)
        params_t = {
            "K": torch.from_numpy(K), "T": torch.from_numpy(T2),
            "previous_T": torch.from_numpy(T1),
            "last_disp": o1["flow_q"], "last_net_list": o1["net_list"],
            "fmap1": o1["fmap1"], "baseline": torch.from_numpy(baseline),
        }
        # vacuity guard: the forward warp of the carried state must land a
        # substantial fraction of valid pixels, or the temporal path would be
        # compared on all-masked zeros.
        K_q = torch.from_numpy(K * np.array([[0.25], [0.25], [1.0]],
                                            np.float32))
        _, _, warp_mask = geo_utils_ref.warp(
            -o1["flow_q"], o1["fmap1"],
            geo_utils_ref.cal_relative_transformation(
                torch.from_numpy(T1), torch.from_numpy(T2)),
            K_q, torch.linalg.inv(K_q), torch.from_numpy(baseline))
        assert warp_mask.float().mean().item() > 0.3, warp_mask.float().mean()

        o2 = torch_reference(nchw(img1b), nchw(img2b), iters=iters,
                             params=params_t, test_mode=True)
    ref_flow2 = o2["flow"].permute(0, 2, 3, 1).numpy()
    ref_flow_q2 = o2["flow_q"].permute(0, 2, 3, 1).numpy()

    sd = {k: v.numpy() for k, v in torch_reference.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_state_dict(sd))
    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32",
                      argmax_margin=0.3)
    model = TCStereo(cfg=cfg)
    cam = CameraParams(
        K=jnp.asarray(np.broadcast_to(K, (B, 3, 3)).copy()),
        baseline=jnp.asarray(baseline),
    )
    out1 = model.apply(params, jnp.asarray(img1a), jnp.asarray(img2a),
                       TemporalState.zeros(B, H, W, cfg), cam,
                       jnp.asarray(T1), iters=iters, test_mode=True)

    # carried state must agree BEFORE frame 2 consumes it
    err_carry = np.abs(-np.asarray(out1.new_state.disp_q)
                       - o1["flow_q"].permute(0, 2, 3, 1).numpy())
    assert err_carry.max() < 5e-2, err_carry.max()
    err_fmap = np.abs(np.asarray(out1.new_state.fmap1)
                      - o1["fmap1"].permute(0, 2, 3, 1).numpy())
    assert err_fmap.max() < 1e-2, err_fmap.max()

    out2 = model.apply(params, jnp.asarray(img1b), jnp.asarray(img2b),
                       out1.new_state, cam, jnp.asarray(T2), iters=iters,
                       test_mode=True)

    our_flow2 = np.asarray(out2.flow)
    our_flow_q2 = -np.asarray(out2.new_state.disp_q)
    err = np.abs(our_flow2 - ref_flow2)
    assert err.max() < 5e-2, (err.max(), err.mean())
    err_q = np.abs(our_flow_q2 - ref_flow_q2)
    assert err_q.max() < 5e-2, (err_q.max(), err_q.mean())
