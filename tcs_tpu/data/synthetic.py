"""Synthetic stereo-video dataset for end-to-end tests and demos.

Generates random fronto-parallel textured scenes with exact disparity ground
truth: the right view is the left view shifted by the (integer) disparity, so
a correct matcher can drive EPE → 0. Camera poses translate along x so the
temporal warp path is exercised. No reference equivalent — the reference has
no test suite at all (SURVEY.md §4); this implements the "tiny-synthetic
end-to-end convergence test" strategy.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def make_synthetic_frame(rng: np.random.Generator, H: int, W: int,
                         disparity: float):
    """One stereo pair with constant integer disparity and smooth texture."""
    d = int(round(disparity))
    # Smooth random texture (low-frequency) so matching is well-posed.
    low = rng.uniform(0, 255, size=(H // 8 + 2, W // 8 + 2, 3))
    ys = np.linspace(0, low.shape[0] - 1.001, H)
    xs = np.linspace(0, low.shape[1] - 1.001, W)
    y0, x0 = np.floor(ys).astype(int), np.floor(xs).astype(int)
    fy, fx = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    tex = (
        low[y0][:, x0] * (1 - fy) * (1 - fx)
        + low[y0][:, x0 + 1] * (1 - fy) * fx
        + low[y0 + 1][:, x0] * fy * (1 - fx)
        + low[y0 + 1][:, x0 + 1] * fy * fx
    )
    # add high-frequency detail for unambiguous correspondence
    tex = 0.7 * tex + 0.3 * rng.uniform(0, 255, size=(H, W, 3))
    left = tex
    right = np.empty_like(left)
    right[:, : W - d] = left[:, d:]
    right[:, W - d :] = left[:, W - d - 1 : W - d]  # replicate edge
    return left.astype(np.float32), right.astype(np.float32)


class SyntheticStereoSequence:
    """Duck-typed StereoSequenceDataset serving random constant-disparity
    clips. Compatible with SequenceLoader."""

    def __init__(self, n_samples: int = 16, frame_length: int = 2,
                 height: int = 64, width: int = 96, max_disp: float = 12.0,
                 baseline: float = 0.5, fx: float = 100.0):
        self.n_samples = n_samples
        self.frame_length = frame_length
        self.H, self.W = height, width
        self.max_disp = max_disp
        self.baseline = baseline
        self.fx = fx

    def __len__(self):
        return self.n_samples

    def load_sample(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        T, H, W = self.frame_length, self.H, self.W
        disp = float(rng.integers(2, int(self.max_disp)))
        depth = self.baseline * self.fx / disp
        lefts, rights, poses = [], [], []
        for t in range(T):
            l, r = make_synthetic_frame(rng, H, W, disp)
            lefts.append(l)
            rights.append(r)
            Tm = np.eye(4, dtype=np.float32)
            Tm[0, 3] = 0.005 * depth * t  # small x-translation per frame
            poses.append(Tm)
        flow = -np.full((T, H, W, 1), disp, np.float32)
        valid = np.ones((T, H, W, 1), np.float32)
        K = np.array([[self.fx, 0, W / 2], [0, self.fx, H / 2], [0, 0, 1]],
                     np.float32)
        return {
            "image1": np.stack(lefts),
            "image2": np.stack(rights),
            "flow": flow,
            "valid": valid,
            "T": np.stack(poses),
            "K": K,
            "baseline": np.float32(self.baseline),
        }
