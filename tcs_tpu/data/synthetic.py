"""Synthetic stereo-video dataset for end-to-end tests and demos.

Generates fronto-parallel textured scenes with exact disparity ground truth
that are **geometrically consistent across time**: each clip has ONE static
wide texture (a plane at depth Z), and every frame is rendered by sliding a
window across it according to the camera's x-translation — so the carried
temporal state (warped previous disparity + features) genuinely predicts the
next frame, and carried-state-vs-reset comparisons are meaningful
(exercises the paper's central claim; reference warp path
``core/utils/geo_utils.py:158-198``).

Rendering model: a plane at depth Z = baseline·fx/d gives constant disparity
d (the right view is the left view shifted by d pixels). A camera translating
by δ along +x between frames shifts the image content LEFT by
u = fx·δ/Z pixels; with world→cam poses this is T_t[0,3] = −δ·t. Frames are
windows of the shared texture at origin s_t = round(u)·t (left) and s_t + d
(right). No reference equivalent — the reference has no test suite at all
(SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _make_texture(rng: np.random.Generator, H: int, W: int) -> np.ndarray:
    """Smooth low-frequency texture + high-frequency detail, (H, W, 3)."""
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
    # high-frequency detail for unambiguous correspondence
    return 0.7 * tex + 0.3 * rng.uniform(0, 255, size=(H, W, 3))


def make_synthetic_frame(rng: np.random.Generator, H: int, W: int,
                         disparity: float):
    """One stereo pair with constant integer disparity and smooth texture."""
    d = int(round(disparity))
    tex = _make_texture(rng, H, W + d)
    left = tex[:, :W]
    right = tex[:, d : W + d]
    return (np.ascontiguousarray(left, np.float32),
            np.ascontiguousarray(right, np.float32))


class SyntheticStereoSequence:
    """Duck-typed StereoSequenceDataset serving geometrically consistent
    constant-disparity clips under x-translating camera motion. Compatible
    with SequenceLoader.

    ``shift_px`` is the per-frame image shift of the scene content in pixels
    (the camera translation is derived from it: δ = shift_px·Z/fx).
    """

    def __init__(self, n_samples: int = 16, frame_length: int = 2,
                 height: int = 64, width: int = 96, max_disp: float = 12.0,
                 baseline: float = 0.5, fx: float = 100.0,
                 shift_px: int = 4):
        self.n_samples = n_samples
        self.frame_length = frame_length
        self.H, self.W = height, width
        self.max_disp = max_disp
        self.baseline = baseline
        self.fx = fx
        self.shift_px = int(shift_px)

    def __len__(self):
        return self.n_samples

    def load_sample(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        T, H, W = self.frame_length, self.H, self.W
        disp = float(rng.integers(2, int(self.max_disp)))
        d = int(round(disp))
        depth = self.baseline * self.fx / disp
        # ONE static texture wide enough for all frame windows + disparity.
        tex = _make_texture(rng, H, W + d + self.shift_px * (T - 1))
        # camera translation per frame that produces exactly shift_px of
        # image motion: u = fx * delta / Z  =>  delta = shift_px * Z / fx
        delta = self.shift_px * depth / self.fx
        lefts, rights, poses = [], [], []
        for t in range(T):
            s = self.shift_px * t
            lefts.append(np.ascontiguousarray(tex[:, s : s + W], np.float32))
            rights.append(
                np.ascontiguousarray(tex[:, s + d : s + d + W], np.float32)
            )
            Tm = np.eye(4, dtype=np.float32)
            Tm[0, 3] = -delta * t  # world→cam: camera centre at +delta*t
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
