#!/usr/bin/env python
"""Input-pipeline throughput at TartanAir recipe shapes.

Builds a synthetic on-disk TartanAir tree (real PNG encode/decode + npy
depth, native 480×640 frames), then measures SequenceLoader samples/s for a
sweep of num_workers. A sample is one frame_length=4 temporal sequence:
8 PNG decodes + 4 npy reads + sequence-consistent augmentation (12 bilinear
resizes at ~500×670 + crop to 480×640).

The number to beat: the TartanAir train step consumes batch/step_time =
4 / 1.64 s ≈ 2.4 sequences/s per chip (PERF.md), so the loader must sustain
≥ 2.4 samples/s per chip-feeding process for the input pipeline not to be
the bottleneck.

  python scripts/bench_loader.py [--frames 4] [--samples 24] [--workers 1 4 8]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np

H, W = 480, 640


def build_tree(root: Path, n_scenes: int, n_frames: int):
    from PIL import Image

    rng = np.random.default_rng(0)
    for s in range(n_scenes):
        base = root / "TartanAir" / "office" / "office" / "Easy" / f"P{s:03d}"
        (base / "image_left").mkdir(parents=True)
        (base / "image_right").mkdir(parents=True)
        (base / "depth_left").mkdir(parents=True)
        poses = []
        for i in range(n_frames):
            # Natural-image-like content so PNG decode cost is realistic
            # (pure noise compresses terribly; smooth gradients too well).
            yy, xx = np.mgrid[0:H, 0:W]
            img = np.stack(
                [
                    (127 + 120 * np.sin(xx / (9 + s + i) + c)
                     + rng.normal(0, 12, size=(H, W)))
                    for c in range(3)
                ],
                axis=-1,
            ).clip(0, 255).astype(np.uint8)
            Image.fromarray(img).save(base / "image_left" / f"{i:06d}_left.png")
            Image.fromarray(img[:, ::-1]).save(
                base / "image_right" / f"{i:06d}_right.png")
            np.save(base / "depth_left" / f"{i:06d}_left_depth.npy",
                    rng.uniform(2, 30, size=(H, W)).astype(np.float32))
            poses.append(f"{0.05 * i} 0 0 0 0 0 1")
        (base / "pose_left.txt").write_text("\n".join(poses) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--samples", type=int, default=24)
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--scene-frames", type=int, default=12)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    args = p.parse_args()

    from tcs_tpu.data.datasets import TartanAir
    from tcs_tpu.data.loader import SequenceLoader
    from tcs_tpu.data import native_io

    print(f"native IO core: {'yes' if native_io.available() else 'NO (numpy fallback)'}",
          file=sys.stderr)

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        t0 = time.perf_counter()
        build_tree(root, args.scenes, args.scene_frames)
        print(f"tree built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

        aug = {"crop_size": (H, W), "min_scale": -0.2, "max_scale": 0.4,
               "do_flip": False, "yjitter": False}
        mult = -(-args.samples // args.scenes)
        ds = TartanAir(aug, root=str(root), test_keywords=["nothing"],
                       mode="temporal",
                       frame_sample_length=args.frames) * mult

        results = {}
        for nw in args.workers:
            loader = SequenceLoader(ds, batch_size=4, seed=0,
                                    num_workers=nw, prefetch=4)
            # warmup one batch (thread pool spin-up, page cache)
            next(iter(loader))
            n = 0
            t0 = time.perf_counter()
            for batch in loader:
                n += batch["image1"].shape[0]
                if n >= args.samples:
                    break
            dt = time.perf_counter() - t0
            sps = n / dt
            results[nw] = sps
            print(f"num_workers={nw}: {n} samples in {dt:.2f}s = "
                  f"{sps:.2f} samples/s "
                  f"({sps * args.frames:.1f} frames/s)", file=sys.stderr)

        best = max(results.values())
        import json
        print(json.dumps({
            "metric": "loader_samples_per_second",
            "value": round(best, 2),
            "unit": "samples/s",
            "vs_trainstep_consumption": round(best / 2.44, 2),
            "per_workers": {str(k): round(v, 2) for k, v in results.items()},
        }))


if __name__ == "__main__":
    main()
