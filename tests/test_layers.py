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
