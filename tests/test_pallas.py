"""Pallas kernel correctness tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tcs_tpu.ops import corr
from tcs_tpu.ops.pallas.corr_kernel import lookup_pallas


def test_lookup_pallas_matches_oracle(rng):
    B, H, W, C, levels, r = 2, 4, 32, 8, 4, 4
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr.corr_pyramid(cv, levels)
    coords = rng.uniform(-6, W + 6, size=(B, H, W)).astype(np.float32)

    ref = np.asarray(corr.lookup_gather(pyr, jnp.asarray(coords), r))
    out = np.asarray(
        lookup_pallas(pyr, jnp.asarray(coords), radius=r, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_lookup_pallas_integer_coords(rng):
    B, H, W, C, levels, r = 1, 2, 16, 4, 3, 2
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr.corr_pyramid(cv, levels)
    coords = rng.integers(-2, W + 2, size=(B, H, W)).astype(np.float32)
    ref = np.asarray(corr.lookup_gather(pyr, jnp.asarray(coords), r))
    out = np.asarray(
        lookup_pallas(pyr, jnp.asarray(coords), radius=r, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_lookup_pallas_bf16_pyramid(rng):
    """bf16 storage: exact vs a bf16-quantised fp32 oracle (each one-hot
    reduction selects exactly one lane, so storage dtype adds no reduction
    error; the interpolation runs in fp32 on the tap axis)."""
    B, H, W, C, levels, r = 1, 4, 32, 8, 4, 4
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr.corr_pyramid(cv, levels)
    pyr_bf16 = tuple(p.astype(jnp.bfloat16) for p in pyr)
    pyr_quant = tuple(p.astype(jnp.bfloat16).astype(jnp.float32) for p in pyr)
    coords = rng.uniform(0, W, size=(B, H, W)).astype(np.float32)
    ref = np.asarray(corr.lookup_gather(pyr_quant, jnp.asarray(coords), r))
    out = np.asarray(
        lookup_pallas(pyr_bf16, jnp.asarray(coords), radius=r, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)
