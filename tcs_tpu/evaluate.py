"""Temporal evaluation drivers (reference ``evaluate_stereo.py``).

Streaming per-sequence evaluation with temporal state carry:

- :func:`validate_tartanair`       — EPE / D1(>1px) / D3(>3px) over the 20
  held-out TartanAir sequences (reference :120-223).
- :func:`validate_temporal_things` — FlyingThings TEST temporal
  (reference :265-345).
- :func:`submit_kitti`             — KITTI 2015 sequence submission: frame-10
  uint16 PNGs ×256, FPS timing, optional pseudo-color video
  (reference :28-116).
- :func:`evaluate_sequence`        — the shared inner loop.

TPU notes: one jitted step per resolution bucket (images are padded to /32
with the K-tracking :class:`InputPadder`, so all frames of a dataset share a
single compiled executable); metrics accumulate on device and are fetched
per frame as numpy (matching the reference's aggregation exactly,
including the valid-rate weighting of D1/D3).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcs_tpu.config import ModelConfig
from tcs_tpu.data import frame_utils
from tcs_tpu.data.datasets import (
    KITTI,
    SceneFlowDatasets,
    TartanAir,
    tartanair_test_keywords,
)
from tcs_tpu.models import CameraParams, TCStereo, TemporalState
from tcs_tpu.utils.padder import InputPadder
from tcs_tpu.utils.visualization import pseudo_color_map

logger = logging.getLogger(__name__)

SCENEFLOW_TEST_K = np.array(
    [[1050.0, 0.0, 479.5], [0.0, 1050.0, 269.5], [0.0, 0.0, 1.0]], np.float32
)
TARTANAIR_TEST_K = np.array(
    [[320.0, 0.0, 320.0], [0.0, 320.0, 240.0], [0.0, 0.0, 1.0]], np.float32
)


def make_eval_fn(model: TCStereo, iters: int):
    @jax.jit
    def step(params, image1, image2, state, cam, T):
        out = model.apply(params, image1, image2, state, cam, T, iters=iters,
                          test_mode=True)
        return out.flow, out.new_state

    return step


class TemporalEvaluator:
    """Carries state + compiled step across the frames of one sequence."""

    def __init__(self, model: TCStereo, params, cfg: ModelConfig, iters: int):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.iters = iters
        self._step = make_eval_fn(model, iters)
        self.state = None

    def reset(self):
        self.state = None

    def __call__(self, image1: np.ndarray, image2: np.ndarray,
                 K: np.ndarray, baseline: float, T: np.ndarray):
        """image1/2: (H, W, 3) float; returns disparity (H, W) numpy ≥ 0."""
        H, W = image1.shape[:2]
        padder = InputPadder((1, H, W, 3), divis_by=32)
        i1 = jnp.asarray(image1, jnp.float32)[None]
        i2 = jnp.asarray(image2, jnp.float32)[None]
        (i1, i2), Kp = padder.pad(i1, i2, K=jnp.asarray(K, jnp.float32)[None])
        cam = CameraParams(K=Kp, baseline=jnp.full((1,), baseline, jnp.float32))
        if self.state is None:
            Hp = H + padder.pad_lrtb[2] + padder.pad_lrtb[3]
            Wp = W + padder.pad_lrtb[0] + padder.pad_lrtb[1]
            self.state = TemporalState.zeros(1, Hp, Wp, self.cfg)
        flow, self.state = self._step(
            self.params, i1, i2, self.state, cam, jnp.asarray(T, jnp.float32)[None]
        )
        disp = -padder.unpad(flow)
        return np.asarray(disp[0, ..., 0])


def _epe_metrics(disp_pr, disp_gt, max_disp=192.0):
    epe = np.abs(disp_pr - disp_gt)
    val = np.abs(disp_gt) < max_disp
    if not val.any():
        return None
    rate = float(val.mean())
    return {
        "epe": float(epe[val].mean()),
        "d1_weighted": float((epe > 1.0)[val].mean()) * rate,
        "d3_weighted": float((epe > 3.0)[val].mean()) * rate,
        "rate": rate,
    }


def temporal_consistency_metrics(prev_disp, disp, prev_gt, gt,
                                 max_disp: float = 192.0) -> Optional[Dict]:
    """Temporal-consistency metrics in the spirit of the paper's supplementary
    Table 2 (BASELINE.md): |Δd|>3px — the predicted frame-to-frame disparity
    change deviates from the GT change by >3 px — and Relu(Δe)>3px — the
    per-pixel error *increased* by >3 px versus the previous frame.
    Pixel-aligned interpretation (no reprojection); both frames' GT must be
    valid."""
    val = (np.abs(gt) < max_disp) & (np.abs(prev_gt) < max_disp)
    if not val.any():
        return None
    dd = (disp - prev_disp) - (gt - prev_gt)
    de = np.abs(disp - gt) - np.abs(prev_disp - prev_gt)
    return {
        "tc_dd3": float((np.abs(dd) > 3.0)[val].mean()),
        "tc_de3": float((np.maximum(de, 0.0) > 3.0)[val].mean()),
    }


def _aggregate(rows: List[Dict], prefix: str) -> Dict[str, float]:
    epe = float(np.mean([r["epe"] for r in rows]))
    rate = np.mean([r["rate"] for r in rows])
    d1 = 100.0 * np.mean([r["d1_weighted"] for r in rows]) / rate
    d3 = 100.0 * np.mean([r["d3_weighted"] for r in rows]) / rate
    return {f"{prefix}-epe": epe, f"{prefix}-d1": float(d1), f"{prefix}-d3": float(d3)}


def validate_tartanair(model, params, cfg: ModelConfig, iters: int = 5,
                       root: str = "datasets", max_sequences: Optional[int] = None,
                       max_frames: Optional[int] = None) -> Dict[str, float]:
    """Reference ``validate_tartanair`` (:120): 20 held-out sequences."""
    ds = TartanAir(None, root=root, scene_list=[],
                   test_keywords=tartanair_test_keywords(), is_test=True,
                   mode="temporal", load_flow=False)
    ev = TemporalEvaluator(model, params, cfg, iters)
    rows = []
    tc_rows = []
    n_seq = len(ds) if max_sequences is None else min(len(ds), max_sequences)
    for s in range(n_seq):
        img1s, img2s, disps, poses = ds.test_sequence(s)
        ev.reset()
        prev_disp = prev_gt = None
        frames = zip(img1s, img2s, disps, poses)
        for j, (p1, p2, pd, T) in enumerate(frames):
            if max_frames is not None and j >= max_frames:
                break
            disp_gt, _ = frame_utils.readDispTartanAir(pd)
            disp = ev(frame_utils.read_image(p1).astype(np.float32),
                      frame_utils.read_image(p2).astype(np.float32),
                      TARTANAIR_TEST_K, 0.25, T)
            m = _epe_metrics(disp, disp_gt)
            if m:
                rows.append(m)
            if prev_disp is not None:
                tc = temporal_consistency_metrics(prev_disp, disp, prev_gt,
                                                  disp_gt)
                if tc:
                    tc_rows.append(tc)
            prev_disp, prev_gt = disp, disp_gt
    results = _aggregate(rows, "TartanAir")
    if tc_rows:
        results["TartanAir-tc-dd3"] = 100.0 * float(
            np.mean([r["tc_dd3"] for r in tc_rows]))
        results["TartanAir-tc-de3"] = 100.0 * float(
            np.mean([r["tc_de3"] for r in tc_rows]))
    logger.info("Validation TartanAir: %s", results)
    return results


def validate_temporal_things(model, params, cfg: ModelConfig, iters: int = 5,
                             root: str = "datasets",
                             max_sequences: Optional[int] = None) -> Dict[str, float]:
    """Reference ``validate_temporal_things`` (:265): FlyingThings TEST."""
    ds = SceneFlowDatasets(None, root=root, dstype="frames_cleanpass",
                           things_test=True, mode="temporal")
    ev = TemporalEvaluator(model, params, cfg, iters)
    rows = []
    n_seq = len(ds) if max_sequences is None else min(len(ds), max_sequences)
    for s in range(n_seq):
        img1s, img2s, disps, poses = ds.test_sequence(s)
        ev.reset()
        for p1, p2, pd, T in zip(img1s, img2s, disps, poses):
            disp_gt = np.asarray(frame_utils.read_gen(pd), np.float32)
            disp = ev(frame_utils.read_image(p1).astype(np.float32),
                      frame_utils.read_image(p2).astype(np.float32),
                      SCENEFLOW_TEST_K, 1.0, T)
            m = _epe_metrics(disp, disp_gt)
            if m:
                rows.append(m)
    results = _aggregate(rows, "things")
    logger.info("Validation FlyingThings: %s", results)
    return results


def submit_kitti(model, params, cfg: ModelConfig, iters: int = 5,
                 root: str = "datasets/KITTI",
                 image_set: str = "kitti_seq/kitti2015_testings",
                 out_dir: str = "./kitti_15_seq_out", submission: bool = True,
                 num_frames: int = 11) -> Dict[str, float]:
    """Reference ``submit_kitti`` (:28): per-scene intrinsics, fixed baseline
    0.54, FPS timing (val_id>50, frame>6), frame-10 disparity as uint16
    PNG ×256 or pseudo-color video frames."""
    ds = KITTI(None, root=root, is_test=True, mode="temporal",
               image_set=image_set, index_by_scene=True,
               num_frames=num_frames if submission else 21)
    ev = TemporalEvaluator(model, params, cfg, iters)
    elapsed = []
    for val_id in range(len(ds)):
        img1s, img2s, scene_path, poses = ds.test_sequence(val_id)
        calib = frame_utils.read_calib_file(
            os.path.join(scene_path, os.path.basename(scene_path) + ".txt")
        )
        K = frame_utils.intrinsics_from_p_rect(calib["P_rect_02"])
        ev.reset()
        for frame_ind, (p1, p2, T) in enumerate(zip(img1s, img2s, poses)):
            i1 = frame_utils.read_image(p1).astype(np.float32)
            i2 = frame_utils.read_image(p2).astype(np.float32)
            t0 = time.time()
            disp = ev(i1, i2, K, 0.54, T)
            dt = time.time() - t0
            if val_id > 50 and frame_ind > 6:
                elapsed.append(dt)
            if submission and frame_ind == 10:
                sub_dir = os.path.join(out_dir, "disp_0")
                os.makedirs(sub_dir, exist_ok=True)
                frame_utils.write_uint16_png(
                    os.path.join(sub_dir,
                                 os.path.basename(scene_path) + "_10.png"),
                    (disp * 256.0).astype(np.uint16),
                )
            elif not submission:
                vid_dir = os.path.join(out_dir, "video",
                                       os.path.basename(scene_path))
                os.makedirs(vid_dir, exist_ok=True)
                rgb = pseudo_color_map(disp, vmin=0, vmax=96, kitti_style=True)
                from PIL import Image

                Image.fromarray(rgb).save(
                    os.path.join(vid_dir, f"{frame_ind:06d}.png")
                )
    fps = 1.0 / (np.mean(elapsed) + 1e-5) if elapsed else 0.0
    logger.info("Submission KITTI: %.2f FPS", fps)
    return {"kitti-fps": float(fps)}
