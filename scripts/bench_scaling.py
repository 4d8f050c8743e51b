#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness (BASELINE.md north star:
≥85% DP scaling efficiency at 2+ hosts).

Measures steady-state train-step time with the global batch scaled
proportionally to the mesh size (weak scaling), at 1 device vs N devices.
On real pods run one process per host (scripts/train.py flags); for CI this
runs on virtual CPU devices:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_scaling.py --devices 1 2 4 8 --cpu
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench_mesh(n_devices: int, per_device_batch: int, steps: int, H, W, T_len):
    import jax
    import jax.numpy as jnp

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from tcs_tpu.train import make_optimizer, make_train_step
    from tcs_tpu.train.train_step import SequenceBatch, TrainState

    B = per_device_batch * n_devices
    cfg = TrainConfig(model=ModelConfig(mixed_precision=False),
                      train_iters=1, batch_size=B, image_size=(H, W),
                      frame_length=T_len, remat_frames=False)
    model = TCStereo(cfg=cfg.model)
    rng = np.random.default_rng(0)
    K = jnp.asarray(np.broadcast_to(
        np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy())
    cam = CameraParams(K=K, baseline=jnp.full((B,), 0.25))
    state0 = TemporalState.zeros(B, H, W, cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)),
                        jnp.zeros((B, H, W, 3)), state0, cam,
                        jnp.eye(4)[None].repeat(B, 0), iters=1,
                        test_mode=False)

    mesh = create_mesh(jax.devices()[:n_devices])
    sh = batch_sharding(mesh)
    batch = SequenceBatch(
        image1=jax.device_put(rng.uniform(0, 255, (B, T_len, H, W, 3)).astype(np.float32), sh),
        image2=jax.device_put(rng.uniform(0, 255, (B, T_len, H, W, 3)).astype(np.float32), sh),
        flow=jax.device_put(-np.abs(rng.uniform(0, 20, (B, T_len, H, W, 1))).astype(np.float32), sh),
        valid=jax.device_put(np.ones((B, T_len, H, W, 1), np.float32), sh),
        T=jax.device_put(np.broadcast_to(np.eye(4, dtype=np.float32), (B, T_len, 4, 4)).copy(), sh),
        K=jax.device_put(np.asarray(K), sh),
        baseline=jax.device_put(np.full((B,), 0.25, np.float32), sh),
    )
    ts = TrainState.create(apply_fn=model.apply,
                           params=replicate(params, mesh),
                           tx=make_optimizer(cfg))
    step = make_train_step(model, cfg, donate=False)
    with mesh:
        ts, m = step(ts, batch)  # compile
        float(m["live_loss"])
        t0 = time.time()
        for _ in range(steps):
            ts, m = step(ts, batch)
        float(m["live_loss"])
        dt = (time.time() - t0) / steps
    seq_per_s = B / dt
    return dt, seq_per_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--per_device_batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=2, default=[64, 64])
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    H, W = args.size

    base_rate = None
    for n in args.devices:
        if len(jax.devices()) < n:
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        dt, rate = bench_mesh(n, args.per_device_batch, args.steps, H, W,
                              args.frames)
        if base_rate is None:
            base_rate = rate / n
        eff = rate / (n * base_rate) * 100.0
        print(f"devices={n:2d}  step={dt * 1000:8.1f} ms  "
              f"seq/s={rate:7.2f}  scaling-eff={eff:6.1f}%")


if __name__ == "__main__":
    main()
