#!/usr/bin/env python
"""Standalone fwd+bwd benchmark of the feature-encoder stage.

Separates "the encoder composition is slow" from "the train-step context
makes it slow": TCSFeatureEncoder.apply + vjp on one chunk of images, no
frame scan, no remat policy, measured from the device timeline.

  python scripts/bench_encoder.py [--frames 2] [--size 480 640]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcs_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=2,
                   help="frames per chunk (batch multiplier)")
    p.add_argument("--size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.models import TCSFeatureEncoder
    from tcs_tpu.utils.trace_summary import summarize_trace

    H, W = args.size
    N = args.batch * args.frames
    cfg = ModelConfig()
    enc = TCSFeatureEncoder(cfg)

    host = np.random.default_rng(0)
    im1 = jnp.asarray(host.uniform(0, 255, (N, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(host.uniform(0, 255, (N, H, W, 3)).astype(np.float32))
    shapes = jax.eval_shape(lambda k: enc.init(k, im1, im2),
                            jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray((host.standard_normal(s.shape) * 0.02
                               ).astype(s.dtype)), shapes)

    @jax.jit
    def fwd_bwd(p, im1, im2):
        def loss(p):
            out = enc.apply(p, im1, im2)
            return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                       for x in jax.tree_util.tree_leaves(out))
        l, g = jax.value_and_grad(loss)(p)
        return l, g

    @jax.jit
    def perturb(x, s):
        return x + jnp.float32(s) * 0.01

    print(f"encoder chunk: {N} image pairs at {H}x{W}", flush=True)
    t0 = time.time()
    jax.block_until_ready(fwd_bwd(params, perturb(im1, 1), im2))
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    trace_dir = "/tmp/tcs_enc_trace"
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    for i in range(args.iters):
        out = fwd_bwd(params, perturb(im1, 2 + i), im2)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    s = summarize_trace(trace_dir)
    per = s.total_ms / args.iters
    print(f"device total {per:.2f} ms per fwd+bwd of {N} pairs "
          f"({per/args.frames:.2f} ms per {args.batch}-pair frame)", flush=True)
    for name, ms in s.by_category.most_common(8):
        print(f"  {ms/args.iters:8.2f}  {name}", flush=True)
    top = s.by_op.most_common(12)
    for name, ms in top:
        print(f"  {ms/args.iters:8.2f}  {name[:100]}", flush=True)


if __name__ == "__main__":
    main()
