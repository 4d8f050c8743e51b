"""Pallas TPU kernel: fused multi-level correlation lookup.

Fuses, in one VMEM pass over the level-0 cost rows:
  1. on-the-fly pyramid pooling (mean over 2^i lanes),
  2. all (2r+1) taps × num_levels bilinear lookups as dense one-hot
     weighted reductions (no gather primitives — see
     ``tcs_tpu/ops/corr.py: lookup_onehot`` for the XLA formulation and the
     measured motivation).

Compared to the XLA path this removes the pyramid's HBM materialisation and
reads each cost row exactly once per iteration.

Semantics identical to ``corr.lookup_gather`` (grid_sample zero padding);
validated in interpret mode on CPU and against the oracle in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(corr_ref, coords_ref, out_ref, *, radius: int,
                   num_levels: int):
    r = radius
    taps = 2 * r + 1
    corr = corr_ref[...]  # (TH, W1, W2) fp32
    coords = coords_ref[...]  # (TH, W1)
    TH, W1, W2 = corr.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (TH, W1, W2), 2)

    # The level-i pooled value pooled[p] = mean(raw[p·2^i : (p+1)·2^i]), so a
    # one-hot over the pooled axis becomes (lane >> i) == p with weight /2^i
    # over the raw lanes — no reshape/pooling inside the kernel (Mosaic does
    # not support lane-axis shape casts), every level reads the same lanes.
    for i in range(num_levels):
        scale = 2.0 ** i
        c = coords / scale
        base = jnp.floor(c)
        frac = (c - base)[..., None]  # (TH, W1, 1)
        basei = base.astype(jnp.int32)[..., None]  # (TH, W1, 1)
        jdiv = j >> i
        for t, dx in enumerate(range(-r, r + 1)):
            i0 = basei + dx
            w = (1.0 - frac) * (jdiv == i0) + frac * (jdiv == i0 + 1)
            out_ref[:, :, i * taps + t] = jnp.sum(corr * w, axis=-1) / scale


@functools.partial(jax.jit, static_argnames=("radius", "num_levels",
                                             "block_rows", "interpret"))
def lookup_pallas(corr: jax.Array, coords_x: jax.Array, radius: int = 4,
                  num_levels: int = 4, block_rows: int = 8,
                  interpret: bool = False) -> jax.Array:
    """Fused lookup from the level-0 cost volume.

    Args:
      corr: (B, H, W1, W2) fp32 level-0 cost volume (pyramid built in-kernel).
      coords_x: (B, H, W1) continuous x-positions (level-0 units).
      radius: tap radius r.
      num_levels: pyramid levels (W2 divisible by 2**(num_levels-1)).
      block_rows: rows per grid step (VMEM tile height).

    Returns:
      (B, H, W1, num_levels*(2r+1)) fp32.
    """
    B, H, W1, W2 = corr.shape
    taps = 2 * radius + 1
    BH = B * H
    tb = min(block_rows, BH)
    while BH % tb:
        tb -= 1
    corr2 = corr.reshape(BH, W1, W2)
    coords2 = coords_x.reshape(BH, W1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, radius=radius,
                          num_levels=num_levels),
        grid=(BH // tb,),
        in_specs=[
            pl.BlockSpec((tb, W1, W2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, W1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, W1, num_levels * taps),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, W1, num_levels * taps),
                                       jnp.float32),
        interpret=interpret,
    )(corr2, coords2)
    return out.reshape(B, H, W1, num_levels * taps)
