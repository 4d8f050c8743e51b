#!/usr/bin/env bash
# SceneFlow training recipe (reference sceneflow_ddp_train.sh).
# The reference launches 2-GPU torch DDP; here one process drives all local
# TPU chips through the data mesh, and multi-host runs add
# --coordinator/--num_processes/--process_id per host.
set -euo pipefail
cd "$(dirname "$0")/../.."
exec python scripts/train.py --recipe sceneflow --validate "$@"
