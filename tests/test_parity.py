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


def _build_torch_model(**overrides):
    """Fresh reference model with architecture flag overrides (seed 7)."""
    import argparse

    import torch

    cupy = types.ModuleType("cupy")
    cupy.memoize = lambda **kw: (lambda f: f)
    sys.modules.setdefault("cupy", cupy)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    from core.tc_stereo import TCStereo as TorchTCStereo

    kw = dict(
        hidden_dims=[128, 128, 128], corr_levels=4, corr_radius=4,
        n_downsample=2, n_gru_layers=3, context_norm="none",
        shared_backbone=True, slow_fast_gru=False, mixed_precision=False,
        init_thres=0.5,
    )
    kw.update(overrides)
    torch.manual_seed(7)
    model = TorchTCStereo(argparse.Namespace(**kw))
    model.eval()
    return model


def _first_frame_ab(torch_model, cfg, B=1, H=64, W=96, iters=2, seed=0,
                    tol=5e-2):
    """Shared harness: frame-1 (argmax bootstrap) forward A/B on converted
    weights for an arbitrary architecture-variant pair."""
    import torch

    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tools.convert_torch_ckpt import convert_state_dict

    rng = np.random.default_rng(seed)
    img1 = rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = torch_model(
            torch.from_numpy(img1).permute(0, 3, 1, 2),
            torch.from_numpy(img2).permute(0, 3, 1, 2),
            iters=iters, params=None, test_mode=True,
        )
    ref_flow = t_out["flow"].permute(0, 2, 3, 1).numpy()
    ref_flow_q = t_out["flow_q"].permute(0, 2, 3, 1).numpy()

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict(sd, n_gru_layers=cfg.n_gru_layers))
    model = TCStereo(cfg=cfg)
    state = TemporalState.zeros(B, H, W, cfg)
    K = np.broadcast_to(
        np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32), (B, 3, 3)).copy()
    cam = CameraParams(K=jnp.asarray(K), baseline=jnp.full((B,), 0.5))
    out = model.apply(params, jnp.asarray(img1), jnp.asarray(img2), state,
                      cam, jnp.eye(4)[None], iters=iters, test_mode=True)

    err = np.abs(np.asarray(out.flow) - ref_flow)
    assert err.max() < tol, (err.max(), err.mean())
    err_q = np.abs(-np.asarray(out.new_state.disp_q) - ref_flow_q)
    assert err_q.max() < tol, (err_q.max(), err_q.mean())


def test_forward_parity_slow_fast_gru(torch_reference):
    """A/B the slow_fast_gru=True iteration schedule (reference
    tc_stereo.py:182-185: coarse GRUs iterate ahead of the update step).
    Same parameters as the default model — the flag only reorders GRU
    calls — so the weights are shared from the module fixture."""
    from tcs_tpu.config import ModelConfig

    model = _build_torch_model(slow_fast_gru=True)
    model.load_state_dict(torch_reference.state_dict())
    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32",
                      argmax_margin=0.3, slow_fast_gru=True)
    _first_frame_ab(model, cfg)


def test_forward_parity_non_shared_backbone():
    """A/B the shared_backbone=False path: separate fnet matching encoder
    (reference extractor.py:119; constructed at tc_stereo.py:45) and the
    single-image cnet. Pins BasicEncoder numerics + its converter mapping."""
    from tcs_tpu.config import ModelConfig

    model = _build_torch_model(shared_backbone=False)
    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32",
                      argmax_margin=0.3, shared_backbone=False)
    _first_frame_ab(model, cfg, seed=5)


@pytest.fixture(scope="module")
def ref_train():
    """Import the reference train_stereo module (loss oracles), heavy deps
    stubbed — mirrors tests/test_loss_parity.py."""
    for name in ("wandb", "tqdm", "pykitti", "skimage", "skimage.io"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["tqdm"].tqdm = lambda x, *a, **k: x
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.ColorJitter = object
    tvt.Compose = object
    tvt.functional = types.ModuleType("torchvision.transforms.functional")
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.path.insert(0, REFERENCE)
    import train_stereo as ref

    return ref


def test_train_mode_parity(torch_reference, ref_train):
    """A/B the TRAINING forward graph + all four loss scalars, frames 1 → 2.

    The test-mode parity tests pin the final flow only; this pins the
    training-only output surface — the per-iteration
    ``flow_predictions``/``flow_q_predictions``/``disp_grad_q_predictions``
    lists, ``flow_init``/``flow_mono`` upsampling and the ``cost_volume``
    plumbed into the losses (reference ``core/tc_stereo.py:230-244``) — and
    then the four loss scalars exactly as the reference train loop combines
    them (``train_stereo.py:360-399``), through our actual train-step loss
    body (``train_step.frame_losses_parts``).
    """
    import torch

    import core.utils.geo_utils as geo_utils_ref

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.train.train_step import FrameBatch, frame_losses_parts
    from tools.convert_torch_ckpt import convert_state_dict

    geo_utils_ref.softsplat = _softsplat_cpu

    B, H, W = 1, 64, 96
    iters = 2
    rng = np.random.default_rng(11)
    imgs = [rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)
            for _ in range(4)]
    img1a, img2a, img1b, img2b = imgs

    # Smooth ≤0 GT flow + a non-trivial valid mask, shared by both sides.
    base = rng.uniform(5, 25, size=(B, 1, 1, 1)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ramp = (2.0 * xx / W + 1.0 * yy / H).astype(np.float32)[None, ..., None]
    flow_gt = [-(base + 3.0 * ramp + k) for k in range(2)]
    valid = [(rng.uniform(size=(B, H, W, 1)) > 0.15).astype(np.float32)
             for _ in range(2)]

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)[None]
    baseline = np.array([0.5], np.float32)
    T1 = np.eye(4, dtype=np.float32)[None]
    ang = 0.01
    R = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, :3] = R
    T2[:3, 3] = [0.05, 0.02, -0.10]
    T2 = T2[None]

    def nchw(x):
        return torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    # --- reference: train-mode forward, frames 1 then 2, and the 4 losses ---
    torch_reference.train()
    try:
        n_pred = iters
        adj = 0.9 ** (15 / (n_pred - 1))
        weights = [adj ** (n_pred - 1 - i) for i in range(n_pred)]

        def ref_frame_losses(out, fgt, v):
            fgt_t, v_t = nchw(fgt), nchw(v)
            mag = torch.sum(fgt_t ** 2, dim=1).sqrt()
            v_t = ((v_t[:, 0] >= 0.5) & (mag < 700)).unsqueeze(1)
            grad_gt, _ = geo_utils_ref.disp2disp_gradient_xy(-fgt_t)
            norm_gt = torch.nn.functional.normalize(
                torch.cat((grad_gt, -torch.ones_like(grad_gt[:, :1])), dim=1),
                dim=1)
            seq, seq_m = ref_train.sequence_loss(
                out["flow_mono"], out["flow_init"], out["flow_predictions"],
                fgt_t, v_t, weights)
            ini, _ = ref_train.init_loss(
                out["cost_volume"], fgt_t, v_t, k=3, scale=0.25, threshold=0.5)
            nrm, _ = ref_train.disp_normal_loss(
                out["flow_q_predictions"], norm_gt, v_t, weights,
                scale=0.25, dense_gt=True)
            grd, _ = ref_train.disp_grad_loss(
                out["disp_grad_q_predictions"], grad_gt, v_t, weights,
                scale=0.25, dense_gt=True)
            return (float(seq), float(ini), float(nrm), float(grd),
                    seq_m["epe"])

        with torch.no_grad():
            o1 = torch_reference(nchw(img1a), nchw(img2a), iters=iters,
                                 params=None, test_mode=False)
            params_t = {
                "K": torch.from_numpy(K), "T": torch.from_numpy(T2),
                "previous_T": torch.from_numpy(T1),
                "last_disp": o1["flow_q"], "last_net_list": o1["net_list"],
                "fmap1": o1["fmap1"],
                "baseline": torch.from_numpy(baseline),
            }
            o2 = torch_reference(nchw(img1b), nchw(img2b), iters=iters,
                                 params=params_t, test_mode=False)
            ref_losses = [ref_frame_losses(o1, flow_gt[0], valid[0]),
                          ref_frame_losses(o2, flow_gt[1], valid[1])]
    finally:
        torch_reference.eval()

    # --- tcs_tpu: same weights, train mode, frames 1 then 2 ---
    sd = {k: v.numpy() for k, v in torch_reference.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_state_dict(sd))
    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32",
                      argmax_margin=0.3, init_thres=0.5)
    tcfg = TrainConfig(model=cfg, train_dataset="TartanAir", init_k=3,
                       frame_length=2, train_iters=iters)
    model = TCStereo(cfg=cfg)
    cam = CameraParams(K=jnp.asarray(np.broadcast_to(K, (B, 3, 3)).copy()),
                       baseline=jnp.asarray(baseline))

    outs, state = [], TemporalState.zeros(B, H, W, cfg)
    for (i1, i2), T in zip(((img1a, img2a), (img1b, img2b)), (T1, T2)):
        out = model.apply(params, jnp.asarray(i1), jnp.asarray(i2), state,
                          cam, jnp.asarray(T), iters=iters, test_mode=False)
        outs.append(out)
        state = out.new_state

    def nhwc(t):  # torch NCHW → numpy NHWC
        return t.detach().permute(0, 2, 3, 1).numpy()

    for fi, (out, ref) in enumerate(zip(outs, (o1, o2))):
        # per-iteration prediction lists
        for it in range(iters):
            for j, name in ((0, "flows_up"), (1, "flow_refine_up")):
                e = np.abs(np.asarray(out.flow_predictions[j][it])
                           - nhwc(ref["flow_predictions"][it][j]))
                assert e.max() < 5e-2, (fi, it, name, e.max())
                e = np.abs(np.asarray(out.flow_q_predictions[j][it])
                           - nhwc(ref["flow_q_predictions"][it][j]))
                assert e.max() < 5e-2, (fi, it, "q" + name, e.max())
            e = np.abs(np.asarray(out.disp_grad_q_predictions[it])
                       - nhwc(ref["disp_grad_q_predictions"][it]))
            assert e.max() < 5e-2, (fi, it, "grad", e.max())
        # init/mono upsampled flows
        e = np.abs(np.asarray(out.flow_init) - nhwc(ref["flow_init"]))
        assert e.max() < 5e-2, (fi, "flow_init", e.max())
        e = np.abs(np.asarray(out.flow_mono) - nhwc(ref["flow_mono"]))
        assert e.max() < 5e-2, (fi, "flow_mono", e.max())
        # masked cost volume: ours (B,h,w,W2) vs reference (B,W2,h,w)
        cv = np.asarray(out.cost_volume).transpose(0, 3, 1, 2)
        e = np.abs(cv - ref["cost_volume"].detach().numpy())
        assert e.max() < 1e-2, (fi, "cost_volume", e.max())
        # training carries (flow_q clipped ≤0 ⇔ disp_q ≥0)
        e = np.abs(-np.asarray(out.new_state.disp_q) - nhwc(ref["flow_q"]))
        assert e.max() < 5e-2, (fi, "carry flow_q", e.max())

    # --- the four loss scalars through our train-step loss body ---
    for fi, out in enumerate(outs):
        frame = FrameBatch(
            image1=jnp.asarray(imgs[2 * fi]), image2=jnp.asarray(imgs[2 * fi + 1]),
            flow=jnp.asarray(flow_gt[fi]), valid=jnp.asarray(valid[fi]),
            T=jnp.asarray((T1, T2)[fi]),
        )
        total, metrics = frame_losses_parts(
            out.flow_predictions, out.flow_q_predictions,
            out.disp_grad_q_predictions, out.flow_init, out.flow_mono,
            out.cost_volume, frame, tcfg,
        )
        seq_r, ini_r, nrm_r, grd_r, epe_r = ref_losses[fi]
        ref_total = seq_r + ini_r + 0.25 * nrm_r + 5.0 * grd_r
        # model-output fp divergence (≤5e-2 per pixel) propagates into the
        # loss means; 2e-2 abs+rel bounds it with margin
        np.testing.assert_allclose(float(total), ref_total, rtol=2e-2,
                                   atol=2e-2, err_msg=f"frame {fi} total")
        np.testing.assert_allclose(float(metrics["init_loss"]), ini_r,
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(float(metrics["norm_loss"]), nrm_r,
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(float(metrics["grad_loss"]), grd_r,
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(float(metrics["epe"]), epe_r,
                                   rtol=2e-2, atol=2e-2)


def test_train_mode_parity_kitti_raw(torch_reference, ref_train):
    """KITTI_raw-recipe variant of the train-mode loss A/B: sparse
    (block-structured) valid masks through the ``dense_gt=False`` loss branch
    (reference ``train_stereo.py:391,397`` — ``train_dataset == 'kitti_raw'``
    switches the normal/grad losses to the strict
    ``F.interpolate(align_corners=True) == 1`` mask).

    The per-tensor model-output parity is already pinned by
    ``test_train_mode_parity`` (same weights, same shapes), and exact-fp
    parity of the sparse-mask semantic by
    ``test_loss_parity.py::test_grad_and_normal_loss_parity_sparse_gt`` —
    this test pins the WIRING: ``TrainConfig(train_dataset='kitti_raw')``
    must reach ``frame_losses_parts`` as ``dense_gt=False``, on real model
    outputs, frame 1. The fixture's architecture flags equal the KITTI
    recipe's (context_norm none, shared_backbone, init_thres 0.5,
    ``KITTI_ddp_train.sh``); init_k keeps the recipe default 3.
    """
    import torch

    import core.utils.geo_utils as geo_utils_ref

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.train.train_step import FrameBatch, frame_losses_parts
    from tools.convert_torch_ckpt import convert_state_dict

    geo_utils_ref.softsplat = _softsplat_cpu

    B, H, W = 1, 64, 96
    iters = 2
    rng = np.random.default_rng(23)
    img1 = rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)

    base = rng.uniform(5, 25, size=(B, 1, 1, 1)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ramp = (2.0 * xx / W + 1.0 * yy / H).astype(np.float32)[None, ..., None]
    flow_gt = -(base + 3.0 * ramp)
    # KITTI-lidar-like sparsity: 16×16 coverage blocks (~60% dense) with 5%
    # per-pixel dropouts inside them. The dropouts make the two mask
    # semantics genuinely different (max-pool>0 keeps a window with ANY
    # valid pixel; strict ==1 kills every window touching a dropout) — on
    # pure blocks aligned to the 4× grid they coincide and the A/B would
    # have no detection power.
    blocks = rng.uniform(size=(B, H // 16, W // 16, 1)) > 0.4
    valid = np.kron(blocks, np.ones((1, 16, 16, 1))).astype(np.float32)
    valid *= (rng.uniform(size=(B, H, W, 1)) > 0.05).astype(np.float32)

    def nchw(x):
        return torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    # --- reference: train-mode frame-1 forward + the 4 losses, sparse GT ---
    torch_reference.train()
    try:
        n_pred = iters
        adj = 0.9 ** (15 / (n_pred - 1))
        weights = [adj ** (n_pred - 1 - i) for i in range(n_pred)]
        with torch.no_grad():
            o1 = torch_reference(nchw(img1), nchw(img2), iters=iters,
                                 params=None, test_mode=False)
        fgt_t, v_t = nchw(flow_gt), nchw(valid)
        mag = torch.sum(fgt_t ** 2, dim=1).sqrt()
        v_t = ((v_t[:, 0] >= 0.5) & (mag < 700)).unsqueeze(1)
        grad_gt, _ = geo_utils_ref.disp2disp_gradient_xy(-fgt_t)
        norm_gt = torch.nn.functional.normalize(
            torch.cat((grad_gt, -torch.ones_like(grad_gt[:, :1])), dim=1),
            dim=1)
        seq_r, _ = ref_train.sequence_loss(
            o1["flow_mono"], o1["flow_init"], o1["flow_predictions"],
            fgt_t, v_t, weights)
        ini_r, _ = ref_train.init_loss(
            o1["cost_volume"], fgt_t, v_t, k=3, scale=0.25, threshold=0.5)
        nrm_r, _ = ref_train.disp_normal_loss(
            o1["flow_q_predictions"], norm_gt, v_t, weights,
            scale=0.25, dense_gt=False)
        grd_r, _ = ref_train.disp_grad_loss(
            o1["disp_grad_q_predictions"], grad_gt, v_t, weights,
            scale=0.25, dense_gt=False)
    finally:
        torch_reference.eval()
    assert not np.isnan(float(nrm_r)) and not np.isnan(float(grd_r))

    # --- tcs_tpu: same weights, kitti_raw recipe loss config ---
    sd = {k: v.numpy() for k, v in torch_reference.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_state_dict(sd))
    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32",
                      argmax_margin=0.3, init_thres=0.5)
    model = TCStereo(cfg=cfg)
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)[None]
    cam = CameraParams(K=jnp.asarray(K), baseline=jnp.asarray([0.5], np.float32))
    out = model.apply(params, jnp.asarray(img1), jnp.asarray(img2),
                      TemporalState.zeros(B, H, W, cfg), cam,
                      jnp.eye(4)[None], iters=iters, test_mode=False)

    frame = FrameBatch(image1=jnp.asarray(img1), image2=jnp.asarray(img2),
                       flow=jnp.asarray(flow_gt), valid=jnp.asarray(valid),
                       T=jnp.eye(4)[None])

    def scalars(tcfg):
        total, metrics = frame_losses_parts(
            out.flow_predictions, out.flow_q_predictions,
            out.disp_grad_q_predictions, out.flow_init, out.flow_mono,
            out.cost_volume, frame, tcfg)
        return float(total), metrics

    tcfg = TrainConfig(model=cfg, train_dataset="kitti_raw", init_k=3,
                       frame_length=1, train_iters=iters)
    total, metrics = scalars(tcfg)
    ref_total = (float(seq_r) + float(ini_r) + 0.25 * float(nrm_r)
                 + 5.0 * float(grd_r))
    # model-output fp divergence (≤5e-2/pixel) + fp-ambiguous mask flips at
    # block boundaries propagate into the masked means → 5e-2 tol.
    np.testing.assert_allclose(float(metrics["norm_loss"]), float(nrm_r),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(float(metrics["grad_loss"]), float(grd_r),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(float(metrics["init_loss"]), float(ini_r),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(total, ref_total, rtol=5e-2, atol=5e-2)

    # Wiring check (exact): frame_losses_parts under the kitti_raw config
    # must produce bit-identical grad loss to a DIRECT dense_gt=False call on
    # the same tensors — and the two mask semantics must be consequentially
    # different on this sparse valid (strict ==1 keeps strictly fewer pixels
    # than max-pool>0), so a wiring bug could not hide behind equal masks.
    from tcs_tpu import losses as L
    from tcs_tpu.geometry import disp2disp_gradient_xy as our_grad_xy
    from tcs_tpu.ops.sampler import max_pool, resize_bilinear

    jvalid = jnp.asarray(valid)
    mag_j = jnp.sqrt(jnp.sum(frame.flow ** 2, axis=-1, keepdims=True))
    v_eff = (jvalid >= 0.5) & (mag_j < 700.0)
    grad_gt_j, _ = our_grad_xy(-frame.flow)
    w_j = L.loss_weights(iters, 0.9)
    direct_sparse, _ = L.disp_grad_loss(
        jnp.stack(list(out.disp_grad_q_predictions)), grad_gt_j, v_eff, w_j,
        scale=0.25, dense_gt=False)
    direct_dense, _ = L.disp_grad_loss(
        jnp.stack(list(out.disp_grad_q_predictions)), grad_gt_j, v_eff, w_j,
        scale=0.25, dense_gt=True)
    assert float(metrics["grad_loss"]) == float(direct_sparse)
    tcfg_dense = TrainConfig(model=cfg, train_dataset="TartanAir", init_k=3,
                             frame_length=1, train_iters=iters)
    _, metrics_dense = scalars(tcfg_dense)
    assert float(metrics_dense["grad_loss"]) == float(direct_dense)
    n_strict = int((resize_bilinear(v_eff.astype(jnp.float32),
                                    (H // 4, W // 4)) == 1.0).sum())
    n_pool = int((max_pool(v_eff.astype(jnp.float32), 4, 4, 0) > 0).sum())
    assert 0 < n_strict < n_pool


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
