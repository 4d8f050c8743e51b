"""Input padding with intrinsics tracking (reference ``core/utils/utils.py:7-48``).

Pads NHWC images so H and W are divisible by ``divis_by`` (replicate padding)
and shifts the principal point of the intrinsics by the applied left/top pad;
``unpad`` reverses both. Matches the reference's 'sintel' mode (symmetric
split) by default.

TPU note: padding decisions are host-side Python on static shapes (shapes are
static under jit anyway); prefer one padder per dataset resolution so each
eval stream compiles exactly once.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tcs_tpu.ops.sampler import replicate_pad


class InputPadder:
    """Pads images such that dimensions are divisible by ``divis_by``."""

    def __init__(self, dims: Tuple[int, ...], mode: str = "sintel",
                 divis_by: int = 32):
        self.ht, self.wd = int(dims[-3]), int(dims[-2])  # NHWC
        pad_ht = (((self.ht // divis_by) + 1) * divis_by - self.ht) % divis_by
        pad_wd = (((self.wd // divis_by) + 1) * divis_by - self.wd) % divis_by
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    @property
    def pad_lrtb(self):
        return tuple(self._pad)

    def _k_shift(self, K):
        shift = np.zeros((3, 3), np.float32)
        shift[0, 2] = self._pad[0]
        shift[1, 2] = self._pad[2]
        return jnp.asarray(shift)

    def pad(self, *inputs, K: Optional[jnp.ndarray] = None):
        """inputs: NHWC tensors. Returns padded list (and shifted K if given)."""
        outs = [replicate_pad(x, self._pad) for x in inputs]
        if K is not None:
            return outs, K + self._k_shift(K)
        return outs

    def unpad(self, x, K: Optional[jnp.ndarray] = None):
        ht, wd = x.shape[-3], x.shape[-2]
        c = [self._pad[2], ht - self._pad[3], self._pad[0], wd - self._pad[1]]
        out = x[..., c[0]:c[1], c[2]:c[3], :]
        if K is not None:
            return out, K - self._k_shift(K)
        return out
