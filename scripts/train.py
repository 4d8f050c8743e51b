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
"""

import argparse
import dataclasses
import logging
import sys

sys.path.insert(0, ".")


def main():
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
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--validate", action="store_true",
                   help="run the recipe's validation every 10k steps")
    # multi-host
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)-8s [%(filename)s:%(lineno)d] %(message)s",
    )

    from tcs_tpu.config import RECIPES
    from tcs_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    cfg = RECIPES[args.recipe]()
    overrides = {}
    for key in ("data_root", "checkpoint_dir", "restore_ckpt", "num_steps",
                "batch_size", "lr", "num_workers", "yjitter",
                "train_dataset", "frame_length", "do_flip", "name",
                "train_iters", "valid_iters", "wdecay", "init_k"):
        v = getattr(args, key)
        if v is not None:
            overrides[key] = v
    for key in ("image_size", "spatial_scale", "saturation_range",
                "img_gamma"):
        v = getattr(args, key)
        if v is not None:
            overrides[key] = tuple(v)
    if args.init_thres is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           init_thres=args.init_thres))
    if args.single_frame:
        overrides["temporal"] = False
        overrides["frame_length"] = 1
    cfg = dataclasses.replace(cfg, **overrides)

    from tcs_tpu.train.trainer import Trainer

    validate_fn = None
    if args.validate:
        from tcs_tpu import evaluate as ev

        if args.recipe == "TartanAir":
            validate_fn = lambda m, p, c: ev.validate_tartanair(
                m, p, c, iters=cfg.valid_iters, root=cfg.data_root)
        elif args.recipe == "sceneflow":
            validate_fn = lambda m, p, c: ev.validate_temporal_things(
                m, p, c, iters=cfg.valid_iters, root=cfg.data_root)

    Trainer(cfg, use_wandb=args.wandb).train(validate_fn=validate_fn)


if __name__ == "__main__":
    main()
