"""Pallas TPU kernel: fused multi-level correlation lookup.

One VMEM pass per GRU iteration over the correlation pyramid computing all
``num_levels × (2r+1)`` bilinear taps (reference ``core/corr.py:33-52``):

- Each pyramid level is read from HBM exactly ONCE per iteration. The XLA
  one-hot formulation (``tcs_tpu/ops/corr.py: lookup_onehot``) re-reads every
  level once per tap — ~9× the HBM traffic.
- Integer-tap formulation: per level, one lane-index delta
  ``d = j − floor(c)`` is built, then the 2r+2 *integer* taps
  ``T_k = Σ_j (d == k)·corr[j]`` are accumulated at ~3 VPU-ops per lane each
  (compare / select / add). Adjacent bilinear outputs share their integer
  neighbours, so the 2r+1 fractional taps cost only a lerp on the tiny tap
  axis: ``out_t = (1−frac)·T_t + frac·T_{t+1}`` in fp32. The XLA one-hot
  path instead builds a full bilinear mask per tap (~7 VPU-ops per lane).
- Out-of-range taps are exactly zero (grid_sample zero padding) for free: an
  out-of-range ``floor(c)+k`` simply matches no lane.
- Because the pyramid is pre-pooled, every one-hot selects exactly ONE lane,
  so the reduction is exact in any storage dtype — bf16 pyramid storage
  (``ModelConfig.corr_dtype``) halves the DMA without precision loss, and the
  interpolation itself runs in fp32 (better than the XLA bf16 path).

Mosaic notes: every operand is reshaped so the grid indexes a leading
singleton dim and the last two block dims equal the array dims (the TPU
block-shape rule); ``block_rows`` stays small because Mosaic stack-allocates
the (tb, W1, W2i) temporaries of all levels together in VMEM.

Semantics identical to ``corr.lookup_gather``; validated in interpret mode on
CPU against the oracle in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(*refs, radius: int, num_levels: int):
    corr_refs = refs[:num_levels]
    coords_ref = refs[num_levels]
    out_ref = refs[num_levels + 1]

    r = radius
    taps = 2 * r + 1
    coords = coords_ref[0].astype(jnp.float32)  # (TH, W1)
    outs = []
    for i, cref in enumerate(corr_refs):
        corr = cref[0]  # (TH, W1, W2i), fp32 or bf16
        TH, W1, W2i = corr.shape
        c = coords * (0.5 ** i)
        base = jnp.floor(c)
        frac = c - base  # fp32 (TH, W1)
        d = (
            jax.lax.broadcasted_iota(jnp.int32, (TH, W1, W2i), 2)
            - base.astype(jnp.int32)[..., None]
        )
        zero = jnp.zeros((), corr.dtype)
        # 2r+2 integer taps; exactly one lane matches (or none ⇒ 0 = the
        # grid_sample zero-padding semantics), so the sum is exact.
        t_int = [
            jnp.sum(jnp.where(d == k, corr, zero), axis=-1).astype(jnp.float32)
            for k in range(-r, r + 2)
        ]
        outs.extend(
            (1.0 - frac) * t_int[t] + frac * t_int[t + 1] for t in range(taps)
        )
    out_ref[0] = jnp.stack(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("radius", "block_rows",
                                             "interpret"))
def lookup_pallas(pyramid, coords_x: jax.Array, radius: int = 4,
                  block_rows: int = 2, interpret: bool = False) -> jax.Array:
    """Fused radius lookup over a correlation pyramid.

    Args:
      pyramid: tuple of (B, H, W1, W2 >> i) volumes (fp32 or bf16), level 0
        first — the output of ``corr.corr_pyramid`` (reference corr.py:21-23).
      coords_x: (B, H, W1) continuous x-positions (level-0 units).
      radius: tap radius r; each level contributes 2r+1 taps.
      block_rows: (B·H) rows per grid step (VMEM temporary-budget knob).

    Returns:
      (B, H, W1, num_levels*(2r+1)) fp32, level-major tap ordering matching
      the reference's channel concat (corr.py:38-52).
    """
    num_levels = len(pyramid)
    B, H, W1, W2 = pyramid[0].shape
    taps = 2 * radius + 1
    BH = B * H
    tb = min(block_rows, BH)
    while BH % tb:
        tb -= 1
    G = BH // tb

    in_specs = [
        pl.BlockSpec((1, tb, W1, lvl.shape[-1]), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for lvl in pyramid
    ]
    in_specs.append(
        pl.BlockSpec((1, tb, W1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    )

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, radius=radius,
                          num_levels=num_levels),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tb, W1, num_levels * taps),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, tb, W1, num_levels * taps),
                                       jnp.float32),
        interpret=interpret,
    )(*[lvl.reshape(G, tb, W1, lvl.shape[-1]) for lvl in pyramid],
      coords_x.reshape(G, tb, W1).astype(jnp.float32))
    return out.reshape(B, H, W1, num_levels * taps)
