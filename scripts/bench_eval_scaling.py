#!/usr/bin/env python
"""Evaluator stream-parallel weak-scaling harness (SCALING.md).

PERF.md's inference floor analysis names "multi-chip stream parallelism
(linear)" as the path past the ~34 ms/frame single-chip latency point; this
backs that claim with a measured weak-scaling row for the mesh-sharded
:class:`tcs_tpu.evaluate.TemporalEvaluator` — N sequence streams advance in
ONE jitted step per frame, batch axis sharded over the mesh (the
reference's ``nn.DataParallel`` eval analogue, evaluate_stereo.py:392).

On real pods each stream rides its own chip; for CI this runs on virtual
CPU devices:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_eval_scaling.py --devices 1 2 4 8 --cpu
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench_streams(n_devices: int, steps: int, warmup: int, H, W, iters: int):
    import jax

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.evaluate import TemporalEvaluator
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.parallel.mesh import create_mesh

    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32")
    model = TCStereo(cfg=cfg)
    import jax.numpy as jnp

    state0 = TemporalState.zeros(1, H, W, cfg)
    cam = CameraParams(K=jnp.eye(3)[None], baseline=jnp.ones((1,)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                        jnp.zeros((1, H, W, 3)), state0, cam,
                        jnp.eye(4)[None], iters=iters, test_mode=True)

    mesh = create_mesh(jax.devices()[:n_devices]) if n_devices > 1 else None
    ev = TemporalEvaluator(model, params, cfg, iters, mesh=mesh)
    D = n_devices
    rng = np.random.default_rng(0)
    K = np.broadcast_to(
        np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32), (D, 3, 3)).copy()
    bl = np.full((D,), 0.25, np.float32)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (D, 4, 4)).copy()

    def frame(j):
        # distinct buffers per step: the runtime returns cached-looking
        # times for repeated identical calls
        i1 = rng.uniform(0, 255, (D, H, W, 3)).astype(np.float32)
        return i1, np.roll(i1, 4, axis=2)

    for j in range(warmup):
        i1, i2 = frame(j)
        ev(i1, i2, K, bl, T)
    t0 = time.time()
    for j in range(steps):
        i1, i2 = frame(warmup + j)
        out = ev(i1, i2, K, bl, T)
    np.asarray(out)  # sync
    dt = (time.time() - t0) / steps
    return dt, D / dt  # per-frame-step latency, aggregate frames/s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--size", type=int, nargs=2, default=(64, 96))
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    ndev = len(jax.devices())
    H, W = args.size
    rows = []
    for n in args.devices:
        if n > ndev:
            print(f"skip {n} devices (have {ndev})", file=sys.stderr)
            continue
        dt, fps = bench_streams(n, args.steps, args.warmup, H, W, args.iters)
        rows.append((n, dt * 1e3, fps))
        print(f"devices={n}: {dt * 1e3:9.1f} ms/frame-step, "
              f"{fps:7.3f} frames/s aggregate", flush=True)
    if rows:
        base = rows[0][2]
        for n, ms, fps in rows:
            print(f"| {n} | {ms:,.0f} | {fps:.3f} | "
                  f"{100 * fps / (base * n):.1f}% |")


if __name__ == "__main__":
    main()
