#!/usr/bin/env python
"""Single-chip training-step throughput at recipe shapes.

Measures steady-state optimizer steps/s (and training frames/s =
steps/s × batch × frame_length) of the jitted BPTT train step on synthetic
data — the training-side counterpart of bench.py. The reference trains
SceneFlow at b4·320×720·fl2 and TartanAir at b4·480×640·fl4 per GPU
(sceneflow_ddp_train.sh / tartanair_ddp_train.sh); pass --recipe to pick the
shape set.

  python scripts/bench_train.py --recipe tartanair [--batch 4] [--steps 10]

Measured history on TPU v5e (tartanair recipe, device-timeline ms/step):
  2605.8 — first measurement (full-frame remat, jnp.sort medians)
  2195.0 — median_pool/median_filter as min/max selection networks
  2188.5 — init_loss top-k as iterative argmax (no XLA sort HLO)
  2064.3 — GRU-iteration scan unrolled (ModelConfig.scan_unroll=5 default)
  1739.2 — batch-stacked encoder trunk in train mode (the packed trunk is
           a B=1-inference optimisation; the model now packs only in
           test_mode — same parameters either way)
  1670.6 — iteration-boundary remat saves (checkpoint_name tags on the GRU
           scan carries + loop-invariant inputs)
  1638.1 — + 'frame_mid' saves (completor / warp-path outputs gating the
           splat + geometry recompute; remat_save_names default)
Rejected variants (kept selectable, all OOM or slower):
  --batch 8             OOM on one v5e chip — the reference's GLOBAL batch 8
                        (4 per GPU × 2) maps to 2 chips × b4 on the DP mesh
  --no-remat            OOM: 68.3G of 15.75G HBM (frame activations)
  --frame-unroll 4      OOM: 60.5G (unrolling defeats per-frame remat)
  --frame-unroll 2      OOM: 25.4G
The backward is ~75% of the step: full-frame remat recompute (the encoder's
half-res stages reformat poorly inside the backward scan body) + conv
backward. Forward leaf ops are ~435 ms/step.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

# Persistent compile cache: the TartanAir-recipe step compiles in ~200 s on
# the benching host; cache hits make iterate-and-measure loops tractable.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcs_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

SHAPES = {
    # Exact recipe crops (sceneflow_ddp_train.sh:9 / tartanair_ddp_train.sh:9
    # / KITTI_ddp_train.sh:9). 320×720's corr pyramid floor-pools odd widths
    # (180 → 90 → 45 → 22) like torch avg_pool1d — see ops/corr.corr_pyramid.
    "sceneflow": dict(H=320, W=720, T=2),
    "tartanair": dict(H=480, W=640, T=4),
    "kitti": dict(H=320, W=1024, T=4),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recipe", default="tartanair", choices=sorted(SHAPES))
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat-mode", default=None,
                   choices=["frame", "encoder", "cell", "encoder_cell",
                            "none"],
                   help="frame = whole-frame jax.checkpoint (default); "
                        "encoder / cell / encoder_cell = selective remat "
                        "inside the model (ModelConfig.remat_encoder / "
                        "remat_iter_cell) with no outer frame remat")
    p.add_argument("--frame-unroll", type=int, default=1)
    p.add_argument("--remat-save", default=None,
                   help="comma-separated checkpoint_name tags to save under "
                        "frame remat (TrainConfig.remat_save_names); "
                        "'' = save nothing (plain full-frame remat)")
    p.add_argument("--scan-unroll", type=int, default=5,
                   help="unroll factor of the GRU-iteration scan")
    p.add_argument("--frames", type=int, default=None,
                   help="override the recipe's frame_length")
    p.add_argument("--size", type=int, nargs=2, default=None,
                   help="override the recipe's H W")
    p.add_argument("--lookup-backend", default=None,
                   help="override ModelConfig.lookup_backend (e.g. "
                        "onehot_w2major_vjp: hand-written linear VJP, no "
                        "pyramid residuals under remat)")
    p.add_argument("--splat-backend", default=None,
                   help="override ModelConfig.splat_backend (xla | "
                        "xla_gatherbwd | xla_fused | xla_aligned)")
    p.add_argument("--encode-save", default=None,
                   help="comma-separated checkpoint_name tags saved inside "
                        "the hoisted encoder remat (TrainConfig."
                        "encode_save_names)")
    p.add_argument("--encode-chunk-frames", type=int, default=None,
                   help="frames per hoisted-encoder call (default: config)")
    import argparse as _ap
    p.add_argument("--losses-outside-scan", action=_ap.BooleanOptionalAction,
                   default=None,
                   help="hoist mask head/upsample/losses out of the frame "
                        "scan (TrainConfig.losses_outside_scan; default ON)")
    p.add_argument("--encode-outside-scan", action=_ap.BooleanOptionalAction,
                   default=None,
                   help="hoist the feature encoder out of the frame scan "
                        "(TrainConfig.encode_outside_scan; default ON)")
    p.add_argument("--corr-pad", type=int, default=None,
                   help="override ModelConfig.corr_pad (zero-pad the corr "
                        "lookup features to a lane-aligned channel count)")

    p.add_argument("--split-transpose", action=_ap.BooleanOptionalAction,
                   default=None,
                   help="lax.scan _split_transpose on the frame scan")
    p.add_argument("--frame-parallel", action=_ap.BooleanOptionalAction,
                   default=None,
                   help="two-phase frame-parallel backward "
                        "(TrainConfig.frame_parallel_backward): Phase A "
                        "collects incoming states gradient-free, Phase B "
                        "differentiates all frames folded into the batch")
    p.add_argument("--frame-inline", action=_ap.BooleanOptionalAction,
                   default=None,
                   help="per-frame value_and_grad inside the forward frame "
                        "scan (TrainConfig.frame_inline_backward): no scan "
                        "transpose, no remat replay; gradient accumulator "
                        "in the carry")
    p.add_argument("--encode-remat", action=_ap.BooleanOptionalAction,
                   default=None,
                   help="checkpoint the hoisted encoder chunk scan "
                        "(TrainConfig.encode_remat); --no-encode-remat "
                        "saves the trunk replay at ~2 GB/chunk residency")
    p.add_argument("--inline-tail-remat", action=_ap.BooleanOptionalAction,
                   default=None,
                   help="remat the per-frame loss tail inside the inline "
                        "backward (TrainConfig.inline_tail_remat)")
    p.add_argument("--profile", action="store_true",
                   help="validate wall-clock against a jax.profiler trace")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.train import make_optimizer, make_train_step
    from tcs_tpu.train.train_step import SequenceBatch, TrainState

    sh = SHAPES[args.recipe]
    B, H, W, T_len = args.batch, sh["H"], sh["W"], sh["T"]
    if args.size is not None:
        H, W = args.size
    if args.frames is not None:
        T_len = args.frames
    dev = jax.devices()[0]
    print(f"train bench on {dev}: B={B} {H}x{W} frames={T_len} "
          f"iters={args.iters}", file=sys.stderr)

    from tcs_tpu.config import ModelConfig
    if args.no_remat and args.remat_mode not in (None, "none"):
        sys.exit(f"--no-remat conflicts with --remat-mode {args.remat_mode}; "
                 "pass only one (--no-remat is an alias for "
                 "--remat-mode none)")
    mode = args.remat_mode or ("none" if args.no_remat else "frame")
    save_names = TrainConfig().remat_save_names
    if args.remat_save is not None:
        save_names = tuple(s for s in args.remat_save.split(",") if s)
    cfg = TrainConfig(train_iters=args.iters, batch_size=B,
                      image_size=(H, W), frame_length=T_len,
                      **({} if args.encode_outside_scan is None else
                         {"encode_outside_scan": args.encode_outside_scan}),
                      **({} if args.encode_chunk_frames is None else
                         {"encode_chunk_frames": args.encode_chunk_frames}),
                      **({} if args.encode_save is None else
                         {"encode_save_names": tuple(
                             s for s in args.encode_save.split(",") if s)}),
                      **({} if args.losses_outside_scan is None else
                         {"losses_outside_scan": args.losses_outside_scan}),
                      **({} if args.frame_parallel is None else
                         {"frame_parallel_backward": args.frame_parallel}),
                      **({} if args.frame_inline is None else
                         {"frame_inline_backward": args.frame_inline}),
                      **({} if args.inline_tail_remat is None else
                         {"inline_tail_remat": args.inline_tail_remat}),
                      **({} if args.encode_remat is None else
                         {"encode_remat": args.encode_remat}),
                      **({} if args.split_transpose is None else
                         {"frame_scan_split_transpose": args.split_transpose}),
                      remat_frames=mode == "frame",
                      remat_save_names=save_names,
                      frame_unroll=args.frame_unroll,
                      model=ModelConfig(
                          scan_unroll=args.scan_unroll,
                          remat_encoder=mode in ("encoder", "encoder_cell"),
                          remat_iter_cell=mode in ("cell", "encoder_cell"),
                          **({"lookup_backend": args.lookup_backend}
                             if args.lookup_backend else {}),
                          **({"splat_backend": args.splat_backend}
                             if args.splat_backend else {}),
                          **({"corr_pad": args.corr_pad}
                             if args.corr_pad else {}),
                      ))
    model = TCStereo(cfg=cfg.model)

    rng = np.random.default_rng(0)
    K = np.broadcast_to(
        np.array([[320.0, 0, W / 2], [0, 320.0, H / 2], [0, 0, 1]],
                 np.float32), (B, 3, 3)).copy()

    # Host-filled params (see bench.py: avoids compiling the init graph).
    state0 = TemporalState.zeros(B, H, W, cfg.model)
    cam = CameraParams(K=jnp.asarray(K), baseline=jnp.full((B,), 0.25))
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((B, H, W, 3)), jnp.zeros((B, H, W, 3)), state0, cam,
            jnp.broadcast_to(jnp.eye(4), (B, 4, 4)), iters=1, test_mode=False),
        jax.random.PRNGKey(0))
    host = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray((host.standard_normal(s.shape) * 0.02
                               ).astype(s.dtype)), shapes)

    tx = make_optimizer(cfg)
    ts = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    train_step = make_train_step(model, cfg)

    def batch_at(seed):
        r = np.random.default_rng(seed)
        eye = np.broadcast_to(np.eye(4, dtype=np.float32), (B, T_len, 4, 4))
        return SequenceBatch(
            image1=jnp.asarray(r.uniform(0, 255, (B, T_len, H, W, 3)).astype(np.float32)),
            image2=jnp.asarray(r.uniform(0, 255, (B, T_len, H, W, 3)).astype(np.float32)),
            flow=jnp.asarray(-np.abs(r.uniform(0, 40, (B, T_len, H, W, 1))).astype(np.float32)),
            valid=jnp.asarray(np.ones((B, T_len, H, W, 1), np.float32)),
            T=jnp.asarray(eye.copy()),
            K=jnp.asarray(K),
            baseline=jnp.full((B,), 0.25),
        )

    # One DISTINCT batch per measured step: the axon runtime returns
    # cached-looking times for repeated calls on previously-seen input
    # buffers (see .claude/skills/verify — only steady-state loops with
    # varying inputs are trustworthy). Staging N full batches OOMs HBM, so
    # derive each step's batch on-device from two staged bases (fresh
    # buffers, negligible cost next to the step itself).
    bases = [batch_at(0), batch_at(1)]

    @jax.jit
    def perturb(b, s):
        return b.replace(image1=jnp.clip(b.image1 + 0.1 * s, 0, 255))

    t0 = time.time()
    ts, metrics = train_step(ts, bases[0])
    jax.block_until_ready(metrics)
    print(f"compile + step 0: {time.time() - t0:.1f}s", file=sys.stderr)

    for k in range(2):
        ts, metrics = train_step(ts, perturb(bases[k % 2], jnp.float32(k + 1)))
    jax.block_until_ready(metrics)

    if args.profile:
        import os
        os.makedirs("/tmp/tcs_train_trace", exist_ok=True)
        jax.profiler.start_trace("/tmp/tcs_train_trace")

    t0 = time.time()
    for k in range(args.steps):
        ts, metrics = train_step(
            ts, perturb(bases[k % 2], jnp.float32(3 + k)))
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / args.steps

    if args.profile:
        jax.profiler.stop_trace()
        from tcs_tpu.utils.trace_summary import summarize_trace
        summ = summarize_trace("/tmp/tcs_train_trace")
        dev_ms = sum(ms for name, ms in summ.jit_ms.items()
                     if name.startswith("jit_train_step")) / args.steps
        print(f"profiler: {dev_ms:.1f} ms/step device time", file=sys.stderr)
        # The axon runtime's wall-clock is NOT trustworthy for long steps
        # (returns before device completion); the device timeline is.
        if dev_ms > 0:
            dt = dev_ms / 1000.0
        else:
            print("profiler trace empty — falling back to wall-clock",
                  file=sys.stderr)
    fps = B * T_len / dt
    print(f"{args.steps} steps: {1000 * dt:.1f} ms/step → {1 / dt:.3f} steps/s, "
          f"{fps:.2f} training frames/s", file=sys.stderr)
    print(json.dumps({
        "metric": f"train_step_ms_{args.recipe}",
        "value": round(1000 * dt, 2),
        "unit": "ms/step",
        "frames_per_second": round(fps, 2),
        "live_loss": float(np.asarray(metrics["live_loss"])),
    }))


if __name__ == "__main__":
    main()
