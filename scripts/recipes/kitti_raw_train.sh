#!/usr/bin/env bash
# KITTI_raw fine-tune recipe (reference KITTI_ddp_train.sh): 60k steps,
# lr 1e-4, crop 320x1024, frame_length 4, LEAStereo pseudo-labels, warm-start
# from the TartanAir checkpoint (pass --restore_ckpt checkpoints/tartanair).
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python scripts/train.py --recipe kitti_raw "$@"
