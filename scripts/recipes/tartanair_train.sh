#!/usr/bin/env bash
# TartanAir training recipe (reference tartanair_ddp_train.sh):
# 100k steps, global batch 8, lr 2e-4, crop 480x640, frame_length 4, iters 5.
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python scripts/train.py --recipe TartanAir --validate "$@"
