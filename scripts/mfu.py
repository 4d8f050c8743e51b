#!/usr/bin/env python
"""Whole-step FLOP counts and MFU estimates.

Compiles the flagship inference step and the training step at recipe shapes
and reads XLA's cost analysis (``compiled.cost_analysis()['flops']``), then
divides by measured device step time × chip peak to get MFU. FLOPs scale
linearly in batch, so the train step is compiled at batch 1 and scaled —
keeps the CPU compile tractable.

  python scripts/mfu.py [--mode inference|train] [--recipe tartanair]

Device peaks used for the MFU column (TPU v5e / "v5 lite"):
bf16 197 TFLOP/s, fp32 ~49 TFLOP/s. The model runs convs in bf16
(mixed_precision) with fp32 correlation/geometry, so bf16 peak is the
honest denominator for an upper-bound-style MFU.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

V5E_PEAK_BF16 = 197e12

RECIPES = {
    # step_ms = round-5 frame-inline + rolled-scan defaults (PERF.md round 5)
    "sceneflow": dict(H=320, W=720, T=2, B=4, step_ms=498.4),
    "tartanair": dict(H=480, W=640, T=4, B=4, step_ms=1346.4),
    "kitti": dict(H=320, W=1024, T=4, B=4, step_ms=1426.9),
}
INFER = dict(H=384, W=1280, ms_per_frame=33.8)


def inference_flops():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from tcs_tpu.config import ModelConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState

    H, W = INFER["H"], INFER["W"]
    cfg = ModelConfig()  # bf16 mixed precision, the benched config
    model = TCStereo(cfg=cfg)
    cam = CameraParams(K=jnp.asarray(
        [[[320.0, 0, W / 2], [0, 320.0, H / 2], [0, 0, 1]]]),
        baseline=jnp.full((1,), 0.54))
    state = TemporalState.zeros(1, H, W, cfg)
    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, H, W, 3)),
                             jnp.zeros((1, H, W, 3)), state, cam,
                             jnp.eye(4)[None], iters=5, test_mode=True),
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)

    @jax.jit
    def step(p, i1, i2, st, T):
        out = model.apply(p, i1, i2, st, cam, T, iters=5, test_mode=True)
        return out.flow, out.new_state

    co = step.lower(params, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
                    state, jnp.eye(4)[None]).compile()
    return float(co.cost_analysis()["flops"])


def train_flops(recipe):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.train import make_optimizer
    from tcs_tpu.train.train_step import (SequenceBatch, TrainState,
                                          make_train_step)

    sh = RECIPES[recipe]
    H, W, T_len = sh["H"], sh["W"], sh["T"]
    cfg = TrainConfig(train_iters=5, batch_size=1, image_size=(H, W),
                      frame_length=T_len)
    model = TCStereo(cfg=cfg.model)
    cam = CameraParams(K=jnp.asarray(
        [[[320.0, 0, W / 2], [0, 320.0, H / 2], [0, 0, 1]]]),
        baseline=jnp.full((1,), 0.25))
    state = TemporalState.zeros(1, H, W, cfg.model)
    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, H, W, 3)),
                             jnp.zeros((1, H, W, 3)), state, cam,
                             jnp.eye(4)[None], iters=1, test_mode=False),
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    ts = TrainState.create(apply_fn=model.apply, params=params,
                           tx=make_optimizer(cfg))
    step = make_train_step(model, cfg, donate=False)
    batch = SequenceBatch(
        image1=jnp.zeros((1, T_len, H, W, 3)),
        image2=jnp.zeros((1, T_len, H, W, 3)),
        flow=jnp.zeros((1, T_len, H, W, 1)),
        valid=jnp.ones((1, T_len, H, W, 1)),
        T=jnp.broadcast_to(jnp.eye(4), (1, T_len, 4, 4)),
        K=cam.K, baseline=cam.baseline,
    )
    co = step.lower(ts, batch).compile()
    # FLOPs are linear in batch; compiled at B=1, recipe runs B=4. Note the
    # remat recompute IS included (it is real executed work), so this MFU is
    # "hardware FLOPs utilisation"; model-FLOPs MFU would divide remat out.
    return float(co.cost_analysis()["flops"]) * sh["B"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["inference", "train"],
                    default="inference")
    ap.add_argument("--recipe", default="tartanair", choices=sorted(RECIPES))
    args = ap.parse_args()

    if args.mode == "inference":
        fl = inference_flops()
        t = INFER["ms_per_frame"] / 1e3
        print(json.dumps({
            "mode": "inference", "shape": f"{INFER['H']}x{INFER['W']}",
            "flops_per_frame": fl,
            "tflops_per_frame": round(fl / 1e12, 3),
            "measured_ms": INFER["ms_per_frame"],
            "achieved_tflops_per_s": round(fl / t / 1e12, 2),
            "mfu_vs_bf16_peak_pct": round(100 * fl / t / V5E_PEAK_BF16, 2),
        }))
    else:
        fl = train_flops(args.recipe)
        t = RECIPES[args.recipe]["step_ms"] / 1e3
        print(json.dumps({
            "mode": "train", "recipe": args.recipe,
            "flops_per_step": fl,
            "tflops_per_step": round(fl / 1e12, 3),
            "measured_ms": RECIPES[args.recipe]["step_ms"],
            "achieved_tflops_per_s": round(fl / t / 1e12, 2),
            "mfu_vs_bf16_peak_pct": round(100 * fl / t / V5E_PEAK_BF16, 2),
        }))


if __name__ == "__main__":
    main()
