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
