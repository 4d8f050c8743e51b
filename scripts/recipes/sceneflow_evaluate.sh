#!/usr/bin/env bash
# FlyingThings temporal evaluation (reference sceneflow_evaluate.sh →
# evaluate_stereo.py validate_temporal_things).
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python scripts/evaluate.py --dataset things "$@"
