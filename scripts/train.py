#!/usr/bin/env python
"""Training CLI (equivalent of the reference launch scripts +
``train_stereo.py __main__``).

Examples:
  python scripts/train.py --recipe TartanAir
  python scripts/train.py --recipe sceneflow --data_root /data
  python scripts/train.py --recipe kitti_raw --restore_ckpt checkpoints/tartanair

Multi-host: run one process per host with --coordinator/--num_processes/
--process_id (``jax.distributed.initialize``), the TPU-native analogue of
``torch.distributed.launch`` in ``*_ddp_train.sh``.

Flag parity vs the reference CLI (train_stereo.py:455-499), 33 flags:
28 map 1:1 by name (here or via --recipe presets); the rest map as follows —
  --temporal      → on by default; --single_frame is the inverse
  --noyjitter     → off by default; --yjitter is the inverse
  --ddp/--local-rank/--device → replaced by --coordinator/--num_processes/
                    --process_id (jax.distributed; no per-GPU rank env)
  --pth_name      → checkpoints are directories named by --name + step
                    (Orbax); use --restore_ckpt to point at any of them
  --sync_bn       → documented skip (PARITY.md §2.5): no recipe enables it
                    and context_norm 'none'/'instance' has no batch stats
"""

import argparse
import dataclasses
import logging
import sys

sys.path.insert(0, ".")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--recipe", required=True,
                   choices=["sceneflow", "TartanAir", "kitti_raw"])
    p.add_argument("--data_root", default="datasets")
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--restore_ckpt", default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--num_workers", type=int, default=None,
                   help="loader decode threads per process")
    p.add_argument("--yjitter", action="store_true", default=None,
                   help="±2px right-image row jitter at crop time")
    p.add_argument("--train_dataset", default=None,
                   help="override the recipe's dataset (e.g. 'kitti' for the "
                        "2015+2012 GT fine-tune, 'sintel_stereo+eth3d' "
                        "mixtures)")
    p.add_argument("--single_frame", action="store_true",
                   help="train single pairs (reference without --temporal): "
                        "sets temporal=False and frame_length=1")
    p.add_argument("--frame_length", type=int, default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--do_flip", default=None, choices=["h", "hf", "v"],
                   help="single-pair flip augmentation")
    p.add_argument("--name", default=None, help="run/checkpoint name")
    p.add_argument("--train_iters", type=int, default=None)
    p.add_argument("--valid_iters", type=int, default=None)
    p.add_argument("--wdecay", type=float, default=None)
    p.add_argument("--init_k", type=int, default=None,
                   help="top-k peaks pushed by the init loss")
    p.add_argument("--spatial_scale", type=float, nargs=2, default=None,
                   metavar=("MIN", "MAX"),
                   help="augmentor random-resize range (log2 factors)")
    p.add_argument("--saturation_range", type=float, nargs=2, default=None,
                   metavar=("MIN", "MAX"))
    p.add_argument("--img_gamma", type=float, nargs=2, default=None,
                   metavar=("MIN", "MAX"))
    p.add_argument("--init_thres", type=float, default=None,
                   help="init-loss margin threshold (ModelConfig.init_thres)")
    # Architecture choices (reference train_stereo.py:481-487). Defaults of
    # None keep the recipe's ModelConfig; the boolean flags come in
    # enable/disable pairs because our recipe defaults differ from the
    # reference argparse defaults (shared_backbone/mixed_precision are ON in
    # every launch script, so they are ON in our recipes).
    p.add_argument("--corr_levels", type=int, default=None,
                   help="levels in the correlation pyramid")
    p.add_argument("--corr_radius", type=int, default=None,
                   help="lookup radius of the correlation pyramid")
    p.add_argument("--n_downsample", type=int, default=None,
                   help="disparity field resolution 1/2^K")
    p.add_argument("--n_gru_layers", type=int, default=None,
                   help="number of hidden GRU levels")
    p.add_argument("--hidden_dims", type=int, nargs="+", default=None,
                   help="hidden state and context dimensions (sets both)")
    p.add_argument("--context_norm", default=None,
                   choices=["group", "batch", "instance", "none"],
                   help="normalization of the context encoder")
    p.add_argument("--shared_backbone", dest="shared_backbone",
                   action="store_true", default=None,
                   help="single backbone for context+feature encoders")
    p.add_argument("--no_shared_backbone", dest="shared_backbone",
                   action="store_false",
                   help="separate fnet matching-feature encoder")
    p.add_argument("--slow_fast_gru", dest="slow_fast_gru",
                   action="store_true", default=None,
                   help="iterate the low-res GRUs more frequently")
    p.add_argument("--mixed_precision", dest="mixed_precision",
                   action="store_true", default=None,
                   help="bf16 conv stacks (fp32 correlation/geometry)")
    p.add_argument("--no_mixed_precision", dest="mixed_precision",
                   action="store_false", help="run everything in fp32")
    p.add_argument("--frame_parallel_backward", action="store_true",
                   default=None,
                   help="two-phase big-batch BPTT backward (equivalence-"
                        "tested; wins on >=32G-HBM chips, loses ~10%% on "
                        "16G v5e — see PERF.md round 4)")
    p.add_argument("--frame_inline_backward", action="store_true",
                   default=None,
                   help="per-frame gradients accumulated inside the forward "
                        "frame scan (equivalence-tested; no scan transpose, "
                        "no remat replay — see PERF.md round 5)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--validate", action="store_true",
                   help="run the recipe's validation every 10k steps")
    # multi-host
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args(argv)


def build_config(args):
    """Map parsed CLI flags onto the recipe's TrainConfig (the 33-flag parity
    table in the module docstring). Pure — no jax import, no side effects —
    so tests can assert every flag lands (tests/test_cli.py)."""
    from tcs_tpu.config import RECIPES

    cfg = RECIPES[args.recipe]()
    overrides = {}
    for key in ("data_root", "checkpoint_dir", "restore_ckpt", "num_steps",
                "batch_size", "lr", "num_workers", "yjitter",
                "train_dataset", "frame_length", "do_flip", "name",
                "train_iters", "valid_iters", "wdecay", "init_k",
                "frame_parallel_backward", "frame_inline_backward"):
        v = getattr(args, key)
        if v is not None:
            overrides[key] = v
    for key in ("image_size", "spatial_scale", "saturation_range",
                "img_gamma"):
        v = getattr(args, key)
        if v is not None:
            overrides[key] = tuple(v)
    model_overrides = {}
    for key in ("corr_levels", "corr_radius", "n_downsample", "n_gru_layers",
                "context_norm", "shared_backbone", "slow_fast_gru",
                "mixed_precision", "init_thres"):
        v = getattr(args, key)
        if v is not None:
            model_overrides[key] = v
    if args.hidden_dims is not None:
        # The reference has one --hidden_dims flag feeding both the hidden
        # and the context dimensions.
        model_overrides["hidden_dims"] = tuple(args.hidden_dims)
        model_overrides["context_dims"] = tuple(args.hidden_dims)
    if model_overrides:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_overrides))
    if args.single_frame:
        overrides["temporal"] = False
        overrides["frame_length"] = 1
    return dataclasses.replace(cfg, **overrides)


def main():
    args = parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)-8s [%(filename)s:%(lineno)d] %(message)s",
    )

    from tcs_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    cfg = build_config(args)

    from tcs_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, use_wandb=args.wandb)
    validate_fn = None
    if args.validate:
        from tcs_tpu import evaluate as ev

        # Error-map wandb images for the first 2 validation sequences
        # (reference logErrorMap role); no-op when wandb is off.
        img_kw = dict(metrics_logger=trainer.logger,
                      log_images=2 if args.wandb else 0)
        if args.recipe == "TartanAir":
            validate_fn = lambda m, p, c: ev.validate_tartanair(
                m, p, c, iters=cfg.valid_iters, root=cfg.data_root, **img_kw)
        elif args.recipe == "sceneflow":
            validate_fn = lambda m, p, c: ev.validate_temporal_things(
                m, p, c, iters=cfg.valid_iters, root=cfg.data_root, **img_kw)

    trainer.train(validate_fn=validate_fn)


if __name__ == "__main__":
    main()
