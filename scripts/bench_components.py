#!/usr/bin/env python
"""Per-component timing at benchmark shapes — the profiling harness behind
the perf pass. Times each stage of the per-frame pipeline in isolation on the
current backend (TPU by default).

  python scripts/bench_components.py [--H 384] [--W 1280]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--H", type=int, default=384)
    p.add_argument("--W", type=int, default=1280)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tcs_tpu.config import ModelConfig
    from tcs_tpu import geometry
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.models.extractor import MultiBasicEncoder, SharedBackboneHead
    from tcs_tpu.ops import corr as corr_ops
    from tcs_tpu.ops.sampler import coords_grid
    from tcs_tpu.ops.splat import softsplat

    B, H, W = 1, args.H, args.W
    cfg = ModelConfig()
    f = cfg.downsample_factor
    h, w = H // f, W // f
    dt = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} H={H} W={W} h={h} w={w}",
          file=sys.stderr)

    img2x = jnp.asarray(rng.uniform(-1, 1, (2 * B, H, W, 3)).astype(np.float32)).astype(dt)
    fmap1 = jnp.asarray(rng.normal(size=(B, h, w, 256)).astype(np.float32))
    fmap2 = jnp.asarray(rng.normal(size=(B, h, w, 256)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(0, 60, (B, h, w, 1)).astype(np.float32))
    flow2d = jnp.asarray(rng.uniform(-3, 3, (B, h, w, 2)).astype(np.float32))
    metric = jnp.asarray(rng.normal(size=(B, h, w, 1)).astype(np.float32))

    # --- backbone ---
    enc = MultiBasicEncoder(output_dims=(cfg.hidden_dims, cfg.context_dims),
                            norm_fn=cfg.context_norm, dtype=dt)
    pe = enc.init(jax.random.PRNGKey(0), img2x, dual_inp=True, num_layers=3)
    bb = jax.jit(lambda p, x: enc.apply(p, x, dual_inp=True, num_layers=3))
    print(f"cnet (2 imgs):        {timeit(bb, pe, img2x):8.2f} ms")

    head = SharedBackboneHead(dtype=dt)
    ph = head.init(jax.random.PRNGKey(0), jnp.zeros((2 * B, h, w, 128), dt))
    hd = jax.jit(lambda p, x: head.apply(p, x))
    trunk = jnp.zeros((2 * B, h, w, 128), dt)
    print(f"conv2 head:           {timeit(hd, ph, trunk):8.2f} ms")

    # --- cost volume ---
    build = jax.jit(corr_ops.build_cost_volume)
    print(f"cost volume einsum:   {timeit(build, fmap1, fmap2):8.2f} ms")
    cv = build(fmap1, fmap2)

    pyr_fn = jax.jit(lambda c: corr_ops.corr_pyramid(c, cfg.corr_levels))
    print(f"corr pyramid:         {timeit(pyr_fn, cv):8.2f} ms")
    pyramid = pyr_fn(cv)

    coords_x = coords_grid(B, h, w)[..., 0] - disp[..., 0]
    look = jax.jit(lambda p, c: corr_ops.lookup(p, c, cfg.corr_radius))
    print(f"corr lookup (1 iter): {timeit(look, pyramid, coords_x):8.2f} ms")

    am = jax.jit(lambda c: corr_ops.argmax_disp(corr_ops.masked_cost_volume(c)))
    print(f"argmax bootstrap:     {timeit(am, cv):8.2f} ms")

    # --- splat warp ---
    feats = jnp.concatenate([disp, fmap1], axis=-1)
    sp = jax.jit(lambda v, fl, m: softsplat(v, fl, m, "soft-clipeps"))
    print(f"softsplat (257ch):    {timeit(sp, feats, flow2d, metric):8.2f} ms")
    spf = jax.jit(lambda v, fl, m: softsplat(v, fl, m, "soft-clipeps",
                                             backend="xla_fused"))
    print(f"softsplat fused:      {timeit(spf, feats, flow2d, metric):8.2f} ms")

    # --- full temporal warp (geometry + splat) ---
    K = jnp.asarray(np.broadcast_to(
        np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy())
    K_inv = jnp.linalg.inv(K)
    T = jnp.eye(4)[None]
    wp = jax.jit(lambda d, fm: geometry.warp(d, fm, T, K, K_inv,
                                             jnp.full((B,), 0.5)))
    print(f"geometry.warp:        {timeit(wp, disp, fmap1):8.2f} ms")

    bg = jax.jit(lambda d: geometry.get_backward_grid(d, T, K, K_inv,
                                                      jnp.full((B,), 0.5)))
    print(f"backward grid:        {timeit(bg, disp):8.2f} ms")

    # --- one full refinement iteration (GRU + dual-space refine) ---
    from tcs_tpu.models.tc_stereo import RefinementCell

    cell = RefinementCell(cfg=cfg, dtype=dt)
    net_list = tuple(
        jnp.zeros((B, h >> i, w >> i, 128), dt) for i in range(3)
    )
    inp_list = tuple(
        tuple(jnp.zeros((B, h >> i, w >> i, 128), dt) for _ in range(3))
        for i in range(3)
    )
    grad_list = tuple(
        jnp.zeros((B, h >> i, w >> i, 64), dt) for i in range(3)
    )
    # The default lookup backend consumes the W2-major pyramid layout.
    if cfg.lookup_backend == "onehot_w2major":
        cell_pyr = jax.jit(
            lambda a, b: tuple(corr_ops.corr_pyramid_w2major(
                corr_ops.build_cost_volume_w2major(a, b), cfg.corr_levels))
        )(fmap1, fmap2)
    else:
        cell_pyr = pyramid
    consts = (cell_pyr, inp_list, grad_list)
    pc = cell.init(jax.random.PRNGKey(0), (net_list, disp), consts)
    it = jax.jit(lambda p, c, x: cell.apply(p, c, x))
    print(f"refinement iteration: {timeit(it, pc, (net_list, disp), consts):8.2f} ms   (x{args.iters} per frame)")

    # --- full model for reference ---
    model = TCStereo(cfg=cfg)
    state = TemporalState.zeros(B, H, W, cfg)
    cam = CameraParams(K=geometry.scale_intrinsics(K, float(f)),
                       baseline=jnp.full((B,), 0.5))
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    pm = model.init(jax.random.PRNGKey(0), img1, img2, state, cam, T,
                    iters=args.iters, test_mode=True)
    full = jax.jit(lambda p, a, b, s: model.apply(p, a, b, s, cam, T,
                                                  iters=args.iters,
                                                  test_mode=True).flow)
    print(f"FULL forward:         {timeit(full, pm, img1, img2, state):8.2f} ms")


if __name__ == "__main__":
    main()
