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
    """Carries state + compiled step across the frames of one (or a batch
    of) sequence stream(s).

    With ``mesh`` (a 1-axis data mesh), a batched call shards the sequence
    batch over the devices — the TPU-native analogue of the reference's
    ``nn.DataParallel`` eval wrap (``evaluate_stereo.py:392``): sequences
    are embarrassingly parallel, one stream per device, all frames of a
    chunk advance in one jitted step."""

    def __init__(self, model: TCStereo, params, cfg: ModelConfig, iters: int,
                 mesh=None):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.iters = iters
        self.mesh = mesh
        self._step = make_eval_fn(model, iters)
        self.state = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from tcs_tpu.parallel import mesh as mesh_lib

            self._batch_sharding = mesh_lib.batch_sharding(mesh)
            self._scalar_sharding = NamedSharding(mesh, PartitionSpec())
            self.params = mesh_lib.replicate(params, mesh)
        else:
            self._batch_sharding = None

    def reset(self):
        self.state = None

    @property
    def n_devices(self) -> int:
        return 1 if self.mesh is None else self.mesh.devices.size

    def _put(self, x):
        if self._batch_sharding is None:
            return x
        # Scalar leaves (e.g. TemporalState flags) replicate; batched arrays
        # shard on the leading axis.
        sh = self._scalar_sharding if np.ndim(x) == 0 else self._batch_sharding
        return jax.device_put(x, sh)

    def __call__(self, image1: np.ndarray, image2: np.ndarray,
                 K: np.ndarray, baseline, T: np.ndarray):
        """image1/2: (H, W, 3) — returns disparity (H, W) numpy ≥ 0 — or
        batched (D, H, W, 3) with K (D,3,3) / baseline (D,) / T (D,4,4) —
        returns (D, H, W). Batched inputs are sharded over ``mesh``."""
        batched = np.ndim(image1) == 4
        if not batched:
            image1, image2 = image1[None], image2[None]
            K, T = np.asarray(K)[None], np.asarray(T)[None]
            baseline = np.full((1,), baseline, np.float32)
        D, H, W = image1.shape[:3]
        padder = InputPadder((D, H, W, 3), divis_by=32)
        i1 = jnp.asarray(image1, jnp.float32)
        i2 = jnp.asarray(image2, jnp.float32)
        (i1, i2), Kp = padder.pad(i1, i2, K=jnp.asarray(K, jnp.float32))
        i1, i2 = self._put(i1), self._put(i2)
        cam = CameraParams(K=self._put(Kp),
                           baseline=self._put(jnp.asarray(baseline,
                                                          jnp.float32)))
        if self.state is None:
            Hp = H + padder.pad_lrtb[2] + padder.pad_lrtb[3]
            Wp = W + padder.pad_lrtb[0] + padder.pad_lrtb[1]
            self.state = jax.tree_util.tree_map(
                self._put, TemporalState.zeros(D, Hp, Wp, self.cfg))
        flow, self.state = self._step(
            self.params, i1, i2, self.state, cam,
            self._put(jnp.asarray(T, jnp.float32)),
        )
        disp = -padder.unpad(flow)
        out = np.asarray(disp[..., 0])
        return out if batched else out[0]


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


def _evaluate_sequences(ev: TemporalEvaluator, seqs: List[Dict],
                        max_frames: Optional[int], on_frame) -> None:
    """Drive sequences through the evaluator in chunks of ``ev.n_devices``.

    Each chunk advances frame-by-frame with ONE jitted step per frame
    covering all streams (batch axis sharded over the mesh when the
    evaluator has one). Streams shorter than the chunk's longest repeat
    their last frame (the model keeps running, the metrics callback is not
    invoked). A chunk shorter than the device count is padded by repeating
    its last sequence, likewise masked. With n_devices == 1 this reduces to
    the serial per-sequence streaming loop.

    seqs: dicts with img1s/img2s/disps/poses lists + K (3,3), baseline
    (float) and read_gt(path) -> np.ndarray.
    on_frame(seq_index, frame_index, disp, disp_gt) collects metrics.
    """
    D = ev.n_devices
    for c0 in range(0, len(seqs), D):
        chunk = seqs[c0 : c0 + D]
        work = chunk + [chunk[-1]] * (D - len(chunk))
        lens = [
            min(len(s["img1s"]), max_frames if max_frames else 10**9)
            for s in work
        ]
        ev.reset()
        for j in range(max(lens[: len(chunk)])):
            i1s, i2s, Ks, Ts, bls = [], [], [], [], []
            gts = [None] * len(work)
            for d, (s, n) in enumerate(zip(work, lens)):
                jj = min(j, n - 1)
                i1s.append(
                    frame_utils.read_image(s["img1s"][jj]).astype(np.float32))
                i2s.append(
                    frame_utils.read_image(s["img2s"][jj]).astype(np.float32))
                Ks.append(s["K"])
                bls.append(s["baseline"])
                Ts.append(np.asarray(s["poses"][jj], np.float32))
                if d < len(chunk) and j < n:
                    gts[d] = s["read_gt"](s["disps"][jj])
            disp = ev(np.stack(i1s), np.stack(i2s), np.stack(Ks),
                      np.asarray(bls, np.float32), np.stack(Ts))
            for d in range(len(chunk)):
                if gts[d] is not None:
                    on_frame(c0 + d, j, disp[d], gts[d])


def validate_tartanair(model, params, cfg: ModelConfig, iters: int = 5,
                       root: str = "datasets", max_sequences: Optional[int] = None,
                       max_frames: Optional[int] = None,
                       mesh=None, metrics_logger=None,
                       log_images: int = 0) -> Dict[str, float]:
    """Reference ``validate_tartanair`` (:120): 20 held-out sequences.

    With ``mesh``, sequences are distributed over the devices (one stream
    per device — the reference's ``nn.DataParallel`` analogue,
    evaluate_stereo.py:392); metrics are identical to the serial path.

    With ``metrics_logger`` and ``log_images`` > 0, the first frame of the
    first ``log_images`` sequences emits a colored error map (wandb image
    when wandb is active; no-op otherwise — the reference's ``logErrorMap``
    visual regression signal, core/utils/visualization.py:147-179)."""
    ds = TartanAir(None, root=root, scene_list=[],
                   test_keywords=tartanair_test_keywords(), is_test=True,
                   mode="temporal", load_flow=False)
    ev = TemporalEvaluator(model, params, cfg, iters, mesh=mesh)
    n_seq = len(ds) if max_sequences is None else min(len(ds), max_sequences)

    def read_gt(path):
        return frame_utils.readDispTartanAir(path)[0]

    seqs = []
    for s in range(n_seq):
        img1s, img2s, disps, poses = ds.test_sequence(s)
        seqs.append(dict(img1s=img1s, img2s=img2s, disps=disps, poses=poses,
                         K=TARTANAIR_TEST_K, baseline=0.25, read_gt=read_gt))

    rows, tc_rows = [], []
    prev = {}  # seq index -> (prev_disp, prev_gt)

    def on_frame(si, j, disp, disp_gt):
        m = _epe_metrics(disp, disp_gt)
        if m:
            rows.append(m)
        if metrics_logger is not None and j == 0 and si < log_images:
            metrics_logger.log_error_map(
                f"val/tartanair_error_seq{si}", disp, disp_gt)
        if si in prev and prev[si][2] == j - 1:
            tc = temporal_consistency_metrics(prev[si][0], disp,
                                              prev[si][1], disp_gt)
            if tc:
                tc_rows.append(tc)
        prev[si] = (disp, disp_gt, j)

    _evaluate_sequences(ev, seqs, max_frames, on_frame)
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
                             max_sequences: Optional[int] = None,
                             mesh=None, metrics_logger=None,
                             log_images: int = 0) -> Dict[str, float]:
    """Reference ``validate_temporal_things`` (:265): FlyingThings TEST.
    ``mesh`` shards sequences over devices (see validate_tartanair);
    ``metrics_logger``/``log_images`` emit first-frame error maps (see
    validate_tartanair)."""
    ds = SceneFlowDatasets(None, root=root, dstype="frames_cleanpass",
                           things_test=True, mode="temporal")
    ev = TemporalEvaluator(model, params, cfg, iters, mesh=mesh)
    n_seq = len(ds) if max_sequences is None else min(len(ds), max_sequences)

    def read_gt(path):
        return np.asarray(frame_utils.read_gen(path), np.float32)

    seqs = []
    for s in range(n_seq):
        img1s, img2s, disps, poses = ds.test_sequence(s)
        seqs.append(dict(img1s=img1s, img2s=img2s, disps=disps, poses=poses,
                         K=SCENEFLOW_TEST_K, baseline=1.0, read_gt=read_gt))

    rows = []

    def on_frame(si, j, disp, gt):
        rows.append(_epe_metrics(disp, gt) or None)
        if metrics_logger is not None and j == 0 and si < log_images:
            metrics_logger.log_error_map(
                f"val/things_error_seq{si}", disp, gt)

    _evaluate_sequences(ev, seqs, None, on_frame)
    rows = [r for r in rows if r]
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
                # pseudo-color .avi per scene, 2 fps MJPG (reference
                # evaluate_stereo.py:103-113); per-frame PNG fallback when
                # cv2 is unavailable.
                rgb = pseudo_color_map(disp, vmin=0, vmax=96, kitti_style=True)
                vid_dir = os.path.join(out_dir, "video")
                os.makedirs(vid_dir, exist_ok=True)
                try:
                    import cv2

                    if frame_ind == 0:
                        video = cv2.VideoWriter(
                            os.path.join(
                                vid_dir,
                                os.path.basename(scene_path) + ".avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 2,
                            (rgb.shape[1], rgb.shape[0]))
                    video.write(rgb[:, :, ::-1])  # RGB → BGR
                except ImportError:
                    png_dir = os.path.join(vid_dir,
                                           os.path.basename(scene_path))
                    os.makedirs(png_dir, exist_ok=True)
                    from PIL import Image

                    Image.fromarray(rgb).save(
                        os.path.join(png_dir, f"{frame_ind:06d}.png")
                    )
        if not submission and "video" in locals():
            video.release()
    fps = 1.0 / (np.mean(elapsed) + 1e-5) if elapsed else 0.0
    logger.info("Submission KITTI: %.2f FPS", fps)
    return {"kitti-fps": float(fps)}
