"""Layer-level torch-parity tests (conv/deconv/norm semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tcs_tpu.models import layers


def test_conv_matches_torch(rng):
    x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    m = layers.Conv(features=5, kernel=3, stride=2, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    w = np.asarray(params["params"]["Conv_0"]["kernel"])  # (kh,kw,I,O)
    b = np.asarray(params["params"]["Conv_0"]["bias"])
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv_s2d_matches_dense(rng):
    """layers.Conv(s2d=s): the block-kernel space-to-depth formulation must
    reproduce the plain conv from the SAME stored parameters (the param tree
    is identical; only the apply-time layout differs)."""
    for s, k, ci, co, H, W in ((4, 7, 6, 64, 16, 24), (2, 7, 3, 8, 12, 16),
                               (4, 3, 6, 8, 8, 16)):
        x = rng.normal(size=(2, H, W, ci)).astype(np.float32)
        dense = layers.Conv(features=co, kernel=k, stride=1, padding=k // 2)
        fast = layers.Conv(features=co, kernel=k, stride=1, padding=k // 2,
                           s2d=s)
        params = dense.init(jax.random.PRNGKey(1), jnp.asarray(x))
        ref = dense.apply(params, jnp.asarray(x))
        out = fast.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_conv_transpose_matches_torch(rng):
    x = rng.normal(size=(1, 6, 8, 3)).astype(np.float32)
    m = layers.ConvTranspose(features=5, kernel=4, stride=2, padding=1,
                             use_bias=False)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    # transpose_kernel=True → flax kernel layout (kh, kw, O, I)
    w = np.asarray(params["params"]["ConvTranspose_0"]["kernel"])
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))  # (I, O, kh, kw)
    ref = F.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), tw, stride=2, padding=1
    ).permute(0, 2, 3, 1).numpy()
    assert out.shape == ref.shape == (1, 12, 16, 5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.normal(size=(2, 6, 7, 4)).astype(np.float32) * 3 + 1
    out = layers.instance_norm(jnp.asarray(x))
    ref = torch.nn.functional.instance_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_group_norm_matches_torch(rng):
    x = rng.normal(size=(2, 6, 7, 16)).astype(np.float32)
    m = layers.GroupNorm(num_groups=2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_residual_block_downsample_params(rng):
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    m = layers.ResidualBlock(planes=8, norm_fn="instance", stride=2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    assert out.shape == (1, 4, 4, 8)
    assert "downsample" in params["params"]
    # identity case has no downsample conv
    m2 = layers.ResidualBlock(planes=4, norm_fn="instance", stride=1)
    p2 = m2.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "downsample" not in p2["params"]


def test_packed_dual_conv_exact():
    """Channel-packed Conv ≡ per-image Conv, bit-for-bit (same params)."""
    import numpy as np
    from tcs_tpu.models.layers import Conv, ResidualBlock

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
    xp = jnp.concatenate([x2[:1], x2[1:]], axis=-1)

    c = Conv(12, 3, 1, 1)
    params = c.init(jax.random.PRNGKey(1), x2)
    ref = c.apply(params, x2)
    out = Conv(12, 3, 1, 1, dual=2).apply(params, xp)
    out2 = jnp.concatenate([out[..., :12], out[..., 12:]], axis=0)
    assert float(jnp.max(jnp.abs(out2 - ref))) == 0.0

    rb = ResidualBlock(12, "none", 1)
    prb = rb.init(jax.random.PRNGKey(2), x2)
    refb = rb.apply(prb, x2)
    outb = ResidualBlock(12, "none", 1, dual=2).apply(prb, xp)
    outb2 = jnp.concatenate([outb[..., :12], outb[..., 12:]], axis=0)
    np.testing.assert_allclose(np.asarray(outb2), np.asarray(refb), atol=1e-5)


def test_packed_dual_encoder_equivalent():
    """Packed dual-image trunk ≡ batch-stacked trunk with the same params.

    Layer-level packing is exact (see test above); through the whole
    unnormalised encoder at random init, fp32 reassociation noise is
    amplified by activation growth, so the end-to-end comparison uses a
    proportional tolerance.
    """
    import numpy as np
    from tcs_tpu.models.extractor import MultiBasicEncoder

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
    for norm in ("none", "instance"):
        enc = MultiBasicEncoder(norm_fn=norm, packed_dual=False)
        params = enc.init(jax.random.PRNGKey(0), x, dual_inp=True)
        ref_outs, ref_trunk = enc.apply(params, x, dual_inp=True)
        enc_p = MultiBasicEncoder(norm_fn=norm, packed_dual=True)
        # identical param tree (the packed path reads the same params)
        params_p = enc_p.init(jax.random.PRNGKey(0), x, dual_inp=True)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_p)
        outs, trunk = enc_p.apply(params, x, dual_inp=True)

        def close(a, b):
            scale = float(jnp.max(jnp.abs(b))) + 1e-6
            assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2

        close(trunk, ref_trunk)
        for (a1, a2), (b1, b2) in zip(outs, ref_outs):
            close(a1, b1)
            close(a2, b2)


def test_conv_in_pad_matches_dense(rng):
    """layers.Conv(in_pad=p): zero-padding input channels + kernel rows at
    apply time must reproduce the plain conv bit-for-bit from the SAME stored
    parameters (the padded rows multiply zeros), including gradients."""
    for p, k, ci, co in ((128, 1, 36, 64), (8, 3, 36, 16), (64, 1, 64, 8)):
        x = rng.normal(size=(2, 6, 10, ci)).astype(np.float32)
        dense = layers.Conv(features=co, kernel=k, stride=1, padding=k // 2)
        fast = layers.Conv(features=co, kernel=k, stride=1, padding=k // 2,
                           in_pad=p)
        params = dense.init(jax.random.PRNGKey(2), jnp.asarray(x))
        ref = dense.apply(params, jnp.asarray(x))
        out = fast.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
        # gradient path: same cotangent -> same param gradient shapes/values
        gref = jax.grad(lambda pr: jnp.sum(dense.apply(pr, jnp.asarray(x)) ** 2))(params)
        gout = jax.grad(lambda pr: jnp.sum(fast.apply(pr, jnp.asarray(x)) ** 2))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b), atol=2e-4),
            gref, gout)
