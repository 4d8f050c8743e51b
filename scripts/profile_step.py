#!/usr/bin/env python
"""Trace the steady-state inference step on TPU and print a per-op summary.

Aggregates device-timeline events from the jax.profiler trace (the same data
TensorBoard shows) into a table of total ms by fused-op name, so the perf
pass knows where the 44 ms/frame actually goes.

  python scripts/profile_step.py [--H 384] [--W 1280] [--train]
"""

import argparse
import collections
import glob
import gzip
import json
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

    # --- parse trace ---
    paths = sorted(glob.glob(os.path.join(
        args.logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no trace file found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # Device-side complete events: pick pids whose process name mentions TPU.
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    # Leaf HLO ops only (events with an hlo_category); the jit_step umbrella
    # and while/conditional wrappers double-count their children.
    agg = collections.Counter()       # by HLO name
    by_mod = collections.Counter()    # by flax module path (tf_op)
    by_cat = collections.Counter()    # by hlo_category
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category")
        if not cat:
            continue
        if cat in ("while", "conditional"):
            continue  # umbrella events — children are counted individually
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1000.0  # us → ms
        tf = a.get("tf_op", "?")
        # strip the scan-body boilerplate for readability
        tf = tf.replace("jit(step)/TCStereo/", "").replace(
            "while/body/closed_call/", "scan/")
        parts = tf.split("/")
        by_mod["/".join(parts[:3])] += dur
        by_cat[cat] += dur
        agg[name] += dur
        total += dur
    per_step = total / args.steps
    print(f"device total {total:.2f} ms over {args.steps} steps "
          f"→ {per_step:.2f} ms/step (leaf ops)")
    print(f"\n{'ms/step':>9}  {'%':>5}  module (tf_op prefix)")
    for name, ms in by_mod.most_common(args.top):
        print(f"{ms/args.steps:9.3f}  {100*ms/total:5.1f}  {name[:110]}")
    print(f"\n{'ms/step':>9}  {'%':>5}  hlo_category")
    for name, ms in by_cat.most_common(15):
        print(f"{ms/args.steps:9.3f}  {100*ms/total:5.1f}  {name}")
    print(f"\n{'ms/step':>9}  {'%':>5}  hlo op")
    for name, ms in agg.most_common(args.top):
        print(f"{ms/args.steps:9.3f}  {100*ms/total:5.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
