"""Loss-function numerics A/B against the reference implementation.

Imports the reference's loss functions (read-only oracle from
/root/reference, wandb stubbed) and checks our jnp losses produce the same
values on identical random inputs. This pins training-objective parity
independently of the model.
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest
import torch

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_losses():
    # Stub heavy/unavailable imports used by train_stereo.py at module scope.
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
    cupy = types.ModuleType("cupy")

    def memoize(**kw):
        def deco(f):
            return f

        return deco

    cupy.memoize = memoize
    sys.modules.setdefault("cupy", cupy)
    # evaluate_stereo imports cv2/skimage at module scope; both exist here.
    sys.path.insert(0, REFERENCE)
    import train_stereo as ref

    return ref


def _t(x):  # NHWC numpy → NCHW torch
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_sequence_loss_parity(ref_losses, rng):
    from tcs_tpu import losses as L

    B, H, W, iters = 2, 32, 48, 3
    flow_gt = -rng.uniform(0, 30, (B, H, W, 1)).astype(np.float32)
    valid = (rng.uniform(size=(B, H, W, 1)) > 0.2).astype(np.float32)
    flow_mono = -rng.uniform(0, 30, (B, H, W, 1)).astype(np.float32)
    flow_init = -rng.uniform(0, 30, (B, H, W, 1)).astype(np.float32)
    flows = -rng.uniform(0, 30, (iters, B, H, W, 1)).astype(np.float32)
    flows_ref = -rng.uniform(0, 30, (iters, B, H, W, 1)).astype(np.float32)
    weights = np.asarray(L.loss_weights(iters, 0.9))

    ours, metrics = L.sequence_loss(
        jnp.asarray(flow_mono), jnp.asarray(flow_init),
        (jnp.asarray(flows), jnp.asarray(flows_ref)),
        jnp.asarray(flow_gt), jnp.asarray(valid) > 0.5, jnp.asarray(weights),
    )

    preds = [[_t(flows[i]), _t(flows_ref[i])] for i in range(iters)]
    ref, ref_metrics = ref_losses.sequence_loss(
        _t(flow_mono), _t(flow_init), preds, _t(flow_gt), _t(valid) > 0.5,
        list(weights),
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    for k in ("epe", "1px", "3px", "5px", "epe_refine"):
        np.testing.assert_allclose(float(metrics[k]), ref_metrics[k],
                                   rtol=1e-4, atol=1e-6)


def test_init_loss_parity(ref_losses, rng):
    from tcs_tpu import losses as L

    B, h, w = 2, 8, 16
    H, W = 4 * h, 4 * w
    # reference layout (B, W2, h, w); ours (B, h, w, W2)
    cv_ours = rng.uniform(-1, 1, (B, h, w, w)).astype(np.float32)
    cv_ref = torch.from_numpy(np.transpose(cv_ours, (0, 3, 1, 2)).copy())
    flow_gt = -rng.uniform(0, 40, (B, H, W, 1)).astype(np.float32)
    valid = (rng.uniform(size=(B, H, W, 1)) > 0.2).astype(np.float32)

    # With an all-valid mask the reference's fp-brittle ``bilinear(valid)==1``
    # test is unambiguous → exact parity of every term.
    ones = np.ones_like(valid)
    ours, m = L.init_loss(jnp.asarray(cv_ours), jnp.asarray(flow_gt),
                          jnp.asarray(ones) > 0.5, k=3, scale=0.25,
                          threshold=0.5)
    ref, mr = ref_losses.init_loss(cv_ref, _t(flow_gt), _t(ones) > 0.5,
                                   k=3, scale=0.25, threshold=0.5)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)
    np.testing.assert_allclose(float(m["init_gt_loss"]), mr["init_gt_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(float(m["init_nm_loss"]), mr["init_nm_loss"],
                               rtol=1e-3, atol=1e-6)

    # Random sparse validity: the reference tests exact equality on a
    # bilinearly interpolated 0/1 field, which flips a handful of boundary
    # pixels between torch and jnp float association — only loose agreement
    # is meaningful here.
    ours2, _ = L.init_loss(jnp.asarray(cv_ours), jnp.asarray(flow_gt),
                           jnp.asarray(valid) > 0.5, k=3, scale=0.25,
                           threshold=0.5)
    ref2, _ = ref_losses.init_loss(cv_ref, _t(flow_gt), _t(valid) > 0.5,
                                   k=3, scale=0.25, threshold=0.5)
    np.testing.assert_allclose(float(ours2), float(ref2), rtol=2e-2)


def test_grad_and_normal_loss_parity(ref_losses, rng):
    from tcs_tpu import losses as L
    from tcs_tpu.geometry import disp2disp_gradient_xy

    B, h, w, iters = 2, 8, 12, 2
    H, W = 4 * h, 4 * w
    flow_gt = -rng.uniform(0, 20, (B, H, W, 1)).astype(np.float32)
    valid = (rng.uniform(size=(B, H, W, 1)) > 0.1).astype(np.float32)
    grads_pred = rng.normal(size=(iters, B, h, w, 2)).astype(np.float32)
    flow_q = -rng.uniform(0, 5, (iters, B, h, w, 1)).astype(np.float32)
    flow_qr = -rng.uniform(0, 5, (iters, B, h, w, 1)).astype(np.float32)
    weights = np.asarray(L.loss_weights(iters, 0.9))

    grad_gt = np.asarray(disp2disp_gradient_xy(jnp.asarray(-flow_gt))[0])
    norm_gt_t = np.concatenate(
        [grad_gt, -np.ones_like(grad_gt[..., :1])], axis=-1
    )
    norm_gt_t = norm_gt_t / np.maximum(
        np.linalg.norm(norm_gt_t, axis=-1, keepdims=True), 1e-12
    )

    ours_g, _ = L.disp_grad_loss(jnp.asarray(grads_pred), jnp.asarray(grad_gt),
                                 jnp.asarray(valid) > 0.5,
                                 jnp.asarray(weights), scale=0.25,
                                 dense_gt=True)
    ref_g, _ = ref_losses.disp_grad_loss(
        [_t(grads_pred[i]) for i in range(iters)], _t(grad_gt),
        _t(valid) > 0.5, list(weights), scale=0.25, dense_gt=True,
    )
    np.testing.assert_allclose(float(ours_g), float(ref_g), rtol=1e-4)

    ours_n, _ = L.disp_normal_loss(
        (jnp.asarray(flow_q), jnp.asarray(flow_qr)), jnp.asarray(norm_gt_t),
        jnp.asarray(valid) > 0.5, jnp.asarray(weights), scale=0.25,
        dense_gt=True,
    )
    preds = [[_t(flow_q[i]), _t(flow_qr[i])] for i in range(iters)]
    ref_n, _ = ref_losses.disp_normal_loss(
        preds, _t(norm_gt_t), _t(valid) > 0.5, list(weights), scale=0.25,
        dense_gt=True,
    )
    np.testing.assert_allclose(float(ours_n), float(ref_n), rtol=1e-4)


def test_grad_and_normal_loss_parity_sparse_gt(ref_losses, rng):
    """A/B the ``dense_gt=False`` branch (the KITTI_raw recipe's loss path,
    reference ``train_stereo.py:391,397``): the valid mask is downsampled with
    ``F.interpolate(mode='bilinear', align_corners=True) == 1`` instead of a
    max-pool — a different (stricter) mask semantic.

    The reference's ``== 1`` test is fp-brittle: torch's bilinear of an
    all-ones neighbourhood is not always exactly 1.0 (weight sums round), and
    neither fp association is canonical. So, as with the ``init_loss`` valid
    test above, parity is pinned in two tiers: an EXACT tier at a geometry
    whose align-corners sample positions are integral (no weight mixing →
    both impls produce bit-identical masks), and a loose tier on 16×16-block
    masks where mismatches are asserted to occur ONLY at fp-ambiguous pixels.
    """
    import torch.nn.functional as F

    from tcs_tpu import losses as L
    from tcs_tpu.geometry import disp2disp_gradient_xy
    from tcs_tpu.ops.sampler import resize_bilinear

    # --- exact tier: H=16 → h=4; positions i·(15/3)=5i are integral, the
    # resize is a pure subsample in both impls, masks are bit-equal and the
    # loss scalars must agree tightly (pins branch wiring + strict ==1 +
    # mask∧gt-mask combination + the per-iteration denominators). ---
    B, h, w, iters = 2, 4, 4, 2
    H, W = 4 * h, 4 * w
    flow_gt = -rng.uniform(0, 20, (B, H, W, 1)).astype(np.float32)
    valid = (rng.uniform(size=(B, H, W, 1)) > 0.4).astype(np.float32)
    v_ref = F.interpolate(_t(valid), scale_factor=0.25, mode="bilinear",
                          align_corners=True) == 1
    v_ours = resize_bilinear(jnp.asarray(valid), (h, w)) == 1.0
    np.testing.assert_array_equal(
        np.asarray(v_ours)[..., 0], v_ref.numpy()[:, 0])
    assert 0 < np.asarray(v_ours).sum() < B * h * w  # non-trivial mask

    grads_pred = rng.normal(size=(iters, B, h, w, 2)).astype(np.float32)
    flow_q = -rng.uniform(0, 5, (iters, B, h, w, 1)).astype(np.float32)
    flow_qr = -rng.uniform(0, 5, (iters, B, h, w, 1)).astype(np.float32)
    weights = np.asarray(L.loss_weights(iters, 0.9))

    grad_gt = np.asarray(disp2disp_gradient_xy(jnp.asarray(-flow_gt))[0])
    norm_gt_t = np.concatenate(
        [grad_gt, -np.ones_like(grad_gt[..., :1])], axis=-1
    )
    norm_gt_t = norm_gt_t / np.maximum(
        np.linalg.norm(norm_gt_t, axis=-1, keepdims=True), 1e-12
    )

    ours_g, _ = L.disp_grad_loss(jnp.asarray(grads_pred), jnp.asarray(grad_gt),
                                 jnp.asarray(valid) > 0.5,
                                 jnp.asarray(weights), scale=0.25,
                                 dense_gt=False)
    ref_g, _ = ref_losses.disp_grad_loss(
        [_t(grads_pred[i]) for i in range(iters)], _t(grad_gt),
        _t(valid) > 0.5, list(weights), scale=0.25, dense_gt=False,
    )
    np.testing.assert_allclose(float(ours_g), float(ref_g), rtol=1e-4)

    ours_n, _ = L.disp_normal_loss(
        (jnp.asarray(flow_q), jnp.asarray(flow_qr)), jnp.asarray(norm_gt_t),
        jnp.asarray(valid) > 0.5, jnp.asarray(weights), scale=0.25,
        dense_gt=False,
    )
    preds = [[_t(flow_q[i]), _t(flow_qr[i])] for i in range(iters)]
    ref_n, _ = ref_losses.disp_normal_loss(
        preds, _t(norm_gt_t), _t(valid) > 0.5, list(weights), scale=0.25,
        dense_gt=False,
    )
    np.testing.assert_allclose(float(ours_n), float(ref_n), rtol=1e-4)

    # --- loose tier: recipe-like geometry (32×48 → 8×12), 16×16-block
    # validity. Mask mismatches may occur ONLY where torch's resized value is
    # fp-ambiguous (within 1e-5 of 1 — the weight-sum rounding lottery); the
    # scalar then agrees loosely (each flipped pixel shifts a masked mean). ---
    B2, h2, w2 = 2, 8, 12
    H2, W2 = 4 * h2, 4 * w2
    blocks = rng.uniform(size=(B2, H2 // 16, W2 // 16, 1)) > 0.5
    valid2 = np.kron(blocks, np.ones((1, 16, 16, 1))).astype(np.float32)
    vr_f = F.interpolate(_t(valid2), scale_factor=0.25, mode="bilinear",
                         align_corners=True)
    v_ref2 = (vr_f == 1).numpy()[:, 0]
    v_ours2 = np.asarray(
        resize_bilinear(jnp.asarray(valid2), (h2, w2)) == 1.0)[..., 0]
    mism = v_ref2 != v_ours2
    ambiguous = np.abs(vr_f.numpy()[:, 0] - 1.0) < 1e-5
    assert np.all(~mism | ambiguous), "mask flip at an fp-unambiguous pixel"

    flow_gt2 = -rng.uniform(0, 20, (B2, H2, W2, 1)).astype(np.float32)
    grad_gt2 = np.asarray(disp2disp_gradient_xy(jnp.asarray(-flow_gt2))[0])
    grads_pred2 = rng.normal(size=(iters, B2, h2, w2, 2)).astype(np.float32)
    ours_b, _ = L.disp_grad_loss(
        jnp.asarray(grads_pred2), jnp.asarray(grad_gt2),
        jnp.asarray(valid2) > 0.5, jnp.asarray(weights), scale=0.25,
        dense_gt=False)
    ref_b, _ = ref_losses.disp_grad_loss(
        [_t(grads_pred2[i]) for i in range(iters)], _t(grad_gt2),
        _t(valid2) > 0.5, list(weights), scale=0.25, dense_gt=False,
    )
    np.testing.assert_allclose(float(ours_b), float(ref_b), rtol=5e-2)

    # Per-pixel random sparsity (true lidar salt): the strict ``== 1`` kills
    # isolated valids in both impls; the reference's empty-mask `[].mean()`
    # is NaN where ours guards the denominator (documented divergence).
    salt = (rng.uniform(size=(B2, H2, W2, 1)) > 0.3).astype(np.float32) * valid2
    ours_s, _ = L.disp_grad_loss(jnp.asarray(grads_pred2),
                                 jnp.asarray(grad_gt2),
                                 jnp.asarray(salt) > 0.5,
                                 jnp.asarray(weights), scale=0.25,
                                 dense_gt=False)
    ref_s, _ = ref_losses.disp_grad_loss(
        [_t(grads_pred2[i]) for i in range(iters)], _t(grad_gt2),
        _t(salt) > 0.5, list(weights), scale=0.25, dense_gt=False,
    )
    if np.isnan(float(ref_s)):
        assert float(ours_s) == 0.0
    else:
        np.testing.assert_allclose(float(ours_s), float(ref_s), rtol=2e-2)


def test_topk_values_matches_lax_topk_with_ties():
    """_topk_values (fused-reduction top-k) must match lax.top_k exactly —
    values, tie order, AND gradient routing — on data with exact-zero ties
    (the suppressed cost-volume entries in init_loss are exact zeros)."""
    import jax
    import jax.numpy as jnp

    from tcs_tpu.losses import _topk_values

    r = np.random.default_rng(0)
    x = r.normal(size=(2, 7, 9, 40)).astype(np.float32)
    x[x > 0.5] = 0.0
    ours = _topk_values(jnp.asarray(x), 3)
    ref, _ = jax.lax.top_k(jnp.asarray(x), 3)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
    w = jnp.arange(1.0, 4.0)
    g1 = jax.grad(lambda v: jnp.sum(_topk_values(v, 3) * w))(jnp.asarray(x))
    g2 = jax.grad(lambda v: jnp.sum(jax.lax.top_k(v, 3)[0] * w))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
