#!/usr/bin/env bash
# MOC training sweep — the TPU-native analogue of the reference's
# per-(fold,shot) GPU fan-out (/root/reference/scripts/moc_train.sh).
# One process, one chip, every episode; XLA compiles each shape once.
#
# Usage: scripts/moc_train.sh <dataset> <result_dir> [data_root]
set -euo pipefail

DATASET="${1:-synthetic}"
RESULT_DIR="${2:-results/moc_train/${DATASET}}"
DATA_ROOT="${3:-data}"

python -m moc_tpu.cli.sweep \
  --dataset "${DATASET}" \
  --shots 1 2 4 8 \
  --folds 0 1 2 3 4 \
  --topj 400 --topk 10 \
  --result_dir "${RESULT_DIR}" \
  --data_root "${DATA_ROOT}"
