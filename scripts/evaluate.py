#!/usr/bin/env python
"""Evaluation CLI (reference ``evaluate_stereo.py __main__`` +
``*_evaluate.sh`` / ``submit_kitti.sh``).

Examples:
  python scripts/evaluate.py --dataset TartanAir --restore_ckpt checkpoints/tartanair
  python scripts/evaluate.py --dataset things --restore_ckpt checkpoints/sceneflow
  python scripts/evaluate.py --dataset kitti --restore_ckpt checkpoints/kitti_raw
"""

import argparse
import logging
import sys

sys.path.insert(0, ".")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["kitti", "things", "TartanAir"])
    p.add_argument("--restore_ckpt", default=None,
                   help="Orbax params/checkpoint dir (weights-only restore)")
    p.add_argument("--data_root", default="datasets")
    p.add_argument("--valid_iters", type=int, default=5)
    p.add_argument("--max_sequences", type=int, default=None)
    p.add_argument("--sharded", action="store_true",
                   help="distribute sequences over all devices (one stream "
                        "per device; reference nn.DataParallel analogue)")
    # Architecture choices, duplicated from the train CLI exactly as the
    # reference duplicates them (evaluate_stereo.py:354-373) — a checkpoint
    # trained with non-default architecture flags needs the same flags to
    # evaluate. Defaults of None keep ModelConfig defaults.
    p.add_argument("--corr_levels", type=int, default=None)
    p.add_argument("--corr_radius", type=int, default=None)
    p.add_argument("--n_downsample", type=int, default=None)
    p.add_argument("--n_gru_layers", type=int, default=None)
    p.add_argument("--hidden_dims", type=int, nargs="+", default=None)
    p.add_argument("--context_norm", default=None,
                   choices=["group", "batch", "instance", "none"])
    p.add_argument("--shared_backbone", dest="shared_backbone",
                   action="store_true", default=None)
    p.add_argument("--no_shared_backbone", dest="shared_backbone",
                   action="store_false")
    p.add_argument("--slow_fast_gru", dest="slow_fast_gru",
                   action="store_true", default=None)
    p.add_argument("--mixed_precision", dest="mixed_precision",
                   action="store_true", default=None)
    p.add_argument("--no_mixed_precision", dest="mixed_precision",
                   action="store_false")
    return p.parse_args(argv)


def build_model_config(args):
    """Map the architecture flag group onto ModelConfig (mirrors the train
    CLI's mapping exactly, as the reference duplicates its arch args between
    train_stereo.py and evaluate_stereo.py). Pure; tested in
    tests/test_cli.py."""
    from tcs_tpu.config import ModelConfig

    overrides = {}
    for key in ("corr_levels", "corr_radius", "n_downsample", "n_gru_layers",
                "context_norm", "shared_backbone", "slow_fast_gru",
                "mixed_precision"):
        v = getattr(args, key)
        if v is not None:
            overrides[key] = v
    if args.hidden_dims is not None:
        overrides["hidden_dims"] = tuple(args.hidden_dims)
        overrides["context_dims"] = tuple(args.hidden_dims)
    return ModelConfig(**overrides)


def main():
    args = parse_args()

    if args.restore_ckpt:
        import os

        if not os.path.isdir(args.restore_ckpt):
            sys.exit(f"error: checkpoint directory not found: {args.restore_ckpt}")

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from tcs_tpu import evaluate as ev
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.utils.checkpoint import CheckpointManager, load_params

    cfg = build_model_config(args)
    model = TCStereo(cfg=cfg)

    # Build a parameter skeleton, then restore.
    H, W = 64, 96
    state0 = TemporalState.zeros(1, H, W, cfg)
    cam = CameraParams(K=jnp.eye(3)[None], baseline=jnp.ones((1,)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                        jnp.zeros((1, H, W, 3)), state0, cam,
                        jnp.eye(4)[None], iters=1, test_mode=True)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"The model has {n / 1e6:.2f}M learnable parameters.")

    if args.restore_ckpt:
        import os

        if not os.path.isdir(args.restore_ckpt):
            sys.exit(f"error: checkpoint directory not found: {args.restore_ckpt}")
        try:
            params = load_params(args.restore_ckpt, params)
        except Exception:
            params = CheckpointManager(args.restore_ckpt).restore_params_only(params)
        print(f"Loaded checkpoint {args.restore_ckpt}")

    mesh = None
    if args.sharded and len(jax.devices()) > 1:
        from tcs_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.create_mesh()
        print(f"sharded eval over {len(jax.devices())} devices")

    if args.dataset == "TartanAir":
        ev.validate_tartanair(model, params, cfg, iters=args.valid_iters,
                              root=args.data_root,
                              max_sequences=args.max_sequences, mesh=mesh)
    elif args.dataset == "things":
        ev.validate_temporal_things(model, params, cfg, iters=args.valid_iters,
                                    root=args.data_root,
                                    max_sequences=args.max_sequences,
                                    mesh=mesh)
    else:
        ev.submit_kitti(model, params, cfg, iters=args.valid_iters,
                        root=f"{args.data_root}/KITTI")


if __name__ == "__main__":
    main()
