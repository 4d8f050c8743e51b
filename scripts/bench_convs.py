#!/usr/bin/env python
"""Micro-benchmark the training step's hottest conv shapes in isolation.

The per-op trace of the TartanAir train step (PERF.md) shows the encoder's
full-resolution 64-channel residual convs and the motion encoder's
36-channel 1x1 corr conv running far off conv roofline in the backward.
This script measures forward and backward (dx+dw) device time of each shape
alone, plus lane-aligned variants, to separate "XLA/v5e can't do better on
this shape" from "the surrounding graph picked a bad layout".

Measurement notes (same rules as bench_train.py): the axon runtime returns
cached-looking wall-clock for repeated calls on previously-seen buffers, so
every iteration perturbs the input on device (fresh buffers) and the numbers
reported are the jax.profiler device-timeline sums of the conv HLOs only.

  python scripts/bench_convs.py layer1 convc1 ...
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcs_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def bench_shape(tag, B, H, W, Cin, Cout, k, dtype=jnp.bfloat16, iters=10):
    from tcs_tpu.utils.trace_summary import summarize_trace

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, Cin), dtype)
    w = jax.random.normal(key, (k, k, Cin, Cout), dtype)
    g = jax.random.normal(key, (B, H, W, Cout), dtype)

    @jax.jit
    def fwd_bwd(x, w, g):
        # g passed as an argument: a closure-captured device array becomes an
        # embedded HLO literal, which stalls XLA constant folding for minutes
        # at these sizes.
        def loss(x, w):
            return jnp.vdot(conv(x, w), g)
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
        return l, grads

    @jax.jit
    def perturb(x, s):
        return x + jnp.asarray(s, dtype) * 0.001

    print(f"  [{tag}] compiling...", flush=True)
    t0 = time.time()
    jax.block_until_ready(fwd_bwd(perturb(x, 1), w, g))
    print(f"  compiled in {time.time()-t0:.0f}s", flush=True)

    trace_dir = "/tmp/tcs_conv_trace"
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    for i in range(iters):
        out = fwd_bwd(perturb(x, 2 + i), w, g)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    s = summarize_trace(trace_dir)
    conv_ms = sum(ms for nm, ms in s.by_category.items()
                  if nm in ("convolution fusion", "convolution")) / iters
    fmt_ms = s.by_category.get("data formatting", 0.0) / iters
    loop_ms = s.by_category.get("loop fusion", 0.0) / iters
    tot = s.total_ms / iters
    flops = 2 * k * k * Cin * Cout * B * H * W * 3  # fwd + dx + dw
    print(f"{tag:40s} conv {conv_ms:7.2f} ms ({flops/conv_ms/1e9:6.1f} TF/s) "
          f"fmt {fmt_ms:6.2f} loop {loop_ms:6.2f} total {tot:7.2f} ms/iter",
          flush=True)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("which", nargs="*",
                   default=["layer1", "s2d", "convc1", "convc1pad"])
    args = p.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    all_shapes = {
        # Encoder full-res layer1 conv (3x3 64ch at 480x640, batch 8 = 2 imgs x b4)
        "layer1": ("layer1 3x3 64->64 @8x480x640", 8, 480, 640, 64, 64, 3),
        "pad128": ("layer1 pad128 3x3 128->128", 8, 480, 640, 128, 128, 3),
        "s2d": ("layer1 s2d-space 3x3 256->256 @240x320", 8, 240, 320, 256, 256, 3),
        "stem": ("stem 7x7 3->64 @8x480x640", 8, 480, 640, 3, 64, 7),
        "layer2": ("layer2 3x3 96->96 @8x240x320", 8, 240, 320, 96, 96, 3),
        "layer3": ("layer3 3x3 128->128 @8x120x160", 8, 120, 160, 128, 128, 3),
        "convc1": ("convc1 1x1 36->64 @4x120x160", 4, 120, 160, 36, 64, 1),
        "convc1pad": ("convc1 pad 1x1 128->64", 4, 120, 160, 128, 64, 1),
        "convzr": ("gru convzr 3x3 446->256 @4x120x160", 4, 120, 160, 446, 256, 3),
    }
    for kname in args.which:
        tag, B, H, W, ci, co, kk = all_shapes[kname]
        bench_shape(tag, B, H, W, ci, co, kk)


if __name__ == "__main__":
    main()
