#!/usr/bin/env bash
# One-command released-checkpoint parity scoring (BASELINE.md north star):
#   [download] -> convert to Flax -> load-smoke -> validate -> print targets
#
# Usage:
#   tools/score_released_ckpt.sh tartanair [--pth FILE] [--data_root DIR]
#   tools/score_released_ckpt.sh sceneflow [--pth FILE] [--data_root DIR]
#   tools/score_released_ckpt.sh tartanair --fabricate   # offline dry-run
#
# The released .pth files live in the reference's Dropbox folder
# (/root/reference/README.md:82):
#   https://www.dropbox.com/scl/fo/ut5uvvispo82prjct67j5/AAe173vjhLhV5VdlKa-Vt7M?rlkey=eba6jrym9fqz4lfehj5zy0mk7&st=eh9gfxrw&dl=0
# Dropbox folder links cannot be fetched non-interactively; download
# tartanair.pth / sceneflow.pth into checkpoints/ first (or pass --pth), or
# set TCS_CKPT_URL to a direct per-file URL and this script will curl it.
# With --fabricate the chain runs against a random-init reference-format
# checkpoint instead (tools/fabricate_ref_ckpt.py) — everything but the
# download is then exercised end-to-end, which is what the offline test
# (tests/test_score_ckpt_chain.py) pins.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET="${1:?usage: score_released_ckpt.sh tartanair|sceneflow [--pth FILE] [--data_root DIR] [--fabricate]}"
shift
PTH=""
DATA_ROOT="datasets"
FABRICATE=0
while [[ $# -gt 0 ]]; do
  case "$1" in
    --pth) PTH="$2"; shift 2;;
    --data_root) DATA_ROOT="$2"; shift 2;;
    --fabricate) FABRICATE=1; shift;;
    *) echo "unknown arg: $1" >&2; exit 1;;
  esac
done

case "$DATASET" in
  tartanair) EVAL_DATASET="TartanAir";;
  sceneflow) EVAL_DATASET="things";;
  *) echo "dataset must be tartanair or sceneflow" >&2; exit 1;;
esac

mkdir -p checkpoints
PTH="${PTH:-checkpoints/${DATASET}.pth}"

# 1) obtain the .pth
if [[ ! -f "$PTH" ]]; then
  if [[ "$FABRICATE" == 1 ]]; then
    echo "== fabricating random-init reference checkpoint (offline dry-run) =="
    python tools/fabricate_ref_ckpt.py --out "$PTH"
  elif [[ -n "${TCS_CKPT_URL:-}" ]]; then
    echo "== downloading $TCS_CKPT_URL =="
    curl -fL "$TCS_CKPT_URL" -o "$PTH"
  else
    cat >&2 <<EOF
checkpoint not found: $PTH
Download ${DATASET}.pth from the reference's Dropbox folder
(/root/reference/README.md:82) into checkpoints/, pass --pth FILE, set
TCS_CKPT_URL to a direct URL, or use --fabricate for an offline dry-run.
EOF
    exit 2
  fi
fi

# 2) convert to the tcs_tpu Flax parameter tree
OUT="checkpoints/${DATASET}_jax"
echo "== converting $PTH -> $OUT =="
python tools/convert_torch_ckpt.py --pth "$PTH" --out "$OUT"

# 3) load smoke: restore into a fresh init tree and run one jitted
#    test-mode forward (proves format + structure + usability)
echo "== load smoke test =="
python - "$OUT" <<'EOF'
import sys
import jax, jax.numpy as jnp
from tcs_tpu.config import ModelConfig
from tcs_tpu.models import CameraParams, TCStereo, TemporalState
from tcs_tpu.utils.checkpoint import load_params

cfg = ModelConfig()
model = TCStereo(cfg=cfg)
B, H, W = 1, 64, 96
state = TemporalState.zeros(B, H, W, cfg)
cam = CameraParams(K=jnp.asarray([[[100.0, 0, W / 2], [0, 100.0, H / 2],
                                   [0, 0, 1]]]), baseline=jnp.ones((1,)))
params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)),
                    jnp.zeros((B, H, W, 3)), state, cam, jnp.eye(4)[None],
                    iters=1, test_mode=True)
params = load_params(sys.argv[1], params)
out = model.apply(params, jnp.zeros((B, H, W, 3)), jnp.zeros((B, H, W, 3)),
                  state, cam, jnp.eye(4)[None], iters=2, test_mode=True)
flow = jax.device_get(out.flow)
assert flow.shape == (B, H, W, 1) and jnp.isfinite(out.flow).all()
n = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"load smoke OK: {n} params, forward finite")
EOF

# 4) score against the evaluation set (needs the dataset on disk)
if [[ ! -d "$DATA_ROOT" ]]; then
  echo "== dataset root '$DATA_ROOT' not present: conversion + load verified,"
  echo "   scoring SKIPPED. Provide --data_root with the evaluation data to"
  echo "   produce EPE/D1/D3 numbers =="
else
  echo "== scoring on $EVAL_DATASET =="
  python scripts/evaluate.py --dataset "$EVAL_DATASET" \
    --restore_ckpt "$OUT" --data_root "$DATA_ROOT"
fi

cat <<'EOF'
== targets (BASELINE.md) ==
TartanAir ablation (G, full model): ALL |Δd|>3px 1.00% / Relu(Δe)>3px 0.45%
Paper parity targets: SceneFlow EPE / TartanAir sequence EPE / KITTI D1-all
(arXiv:2407.11950; compare the printed EPE/D1/D3 above against these).
EOF
