#!/usr/bin/env python
"""Trace the steady-state inference step on TPU and print a per-op summary.

Aggregates device-timeline events from the jax.profiler trace (the same data
TensorBoard shows) into a table of total ms by fused-op name, so the perf
pass knows where the 44 ms/frame actually goes.

  python scripts/profile_step.py [--H 384] [--W 1280] [--train]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--H", type=int, default=384)
    p.add_argument("--W", type=int, default=1280)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--logdir", default="/tmp/tcs_trace")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState

    B, H, W = 1, args.H, args.W
    cfg = ModelConfig()
    model = TCStereo(cfg=cfg)
    rng = np.random.default_rng(0)
    K = np.broadcast_to(
        np.array([[721.5, 0, W / 2], [0, 721.5, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()
    cam = CameraParams(K=jnp.asarray(K), baseline=jnp.full((B,), 0.54))
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    state0 = TemporalState.zeros(B, H, W, cfg)

    def frame(seed):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
            jnp.asarray(r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        )

    shapes = jax.eval_shape(
        lambda k: model.init(k, *frame(0), state0, cam, jnp.asarray(eye),
                             iters=args.iters, test_mode=True),
        jax.random.PRNGKey(0),
    )
    host = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray((host.standard_normal(s.shape) * 0.02).astype(s.dtype)),
        shapes,
    )

    @jax.jit
    def step(params, i1, i2, state, T):
        out = model.apply(params, i1, i2, state, cam, T, iters=args.iters,
                          test_mode=True)
        return out.flow, out.new_state

    t0 = time.time()
    i1, i2 = frame(1)
    flow, state = step(params, i1, i2, state0, jnp.asarray(eye))
    flow.block_until_ready()
    print(f"compile+frame0: {time.time()-t0:.1f}s", file=sys.stderr)
    frames = [frame(2 + k) for k in range(4)]
    for k in range(3):
        flow, state = step(params, *frames[k % 4], state, jnp.asarray(eye))
    flow.block_until_ready()

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    for k in range(args.steps):
        flow, state = step(params, *frames[k % 4], state, jnp.asarray(eye))
    flow.block_until_ready()
    jax.profiler.stop_trace()

    # --- parse trace (shared leaf-op aggregation) ---
    from tcs_tpu.utils.trace_summary import print_summary, summarize_trace

    summ = summarize_trace(args.logdir,
                           strip_prefixes=("jit(step)/TCStereo/",))
    if summ.total_ms == 0:
        print("no trace file found", file=sys.stderr)
        return
    print_summary(summ, steps=args.steps, top=args.top)


if __name__ == "__main__":
    main()
