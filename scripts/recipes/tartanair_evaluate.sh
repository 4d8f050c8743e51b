#!/usr/bin/env bash
# TartanAir sequence evaluation (reference tartanair_evaluate.sh →
# evaluate_stereo.py validate_tartanair: EPE/D1/D3 over 20 held-out scenes).
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python scripts/evaluate.py --dataset TartanAir "$@"
