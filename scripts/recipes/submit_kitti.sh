#!/usr/bin/env bash
# KITTI submission (reference submit_kitti.sh → evaluate_stereo.py
# submit_kitti): uint16 PNG x256 disparity maps + FPS timing.
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python scripts/evaluate.py --dataset kitti "$@"
