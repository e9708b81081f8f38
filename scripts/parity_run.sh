#!/usr/bin/env bash
# Checkpoint-parity rehearsal: the one-command protocol for the day real
# CONCH weights (+ CLAM feature dirs) land. Converts the checkpoint, builds
# the zero-shot weight matrices from the vendored prompt banks, runs the
# full fused episode sweep, and emits summary_{shot}.csv per the reference
# protocol (/root/reference/main_moc.py:586-644, scripts/moc_train.sh).
#
# Usage:
#   scripts/parity_run.sh <dataset: nsclc|rcc> <conch_ckpt.bin> \
#       <feature_dir> [result_dir] [tokenizer.json]
#
# Then compare results/<dataset>/summary_{1,2,4,8}.csv against a
# reference-produced summary (target: AUC within 0.5 pt, BASELINE.md).
# The env-gated converter/weight diff drill is:
#   MOC_TPU_CONCH_CKPT=<ckpt> python -m pytest tests/test_realckpt.py -m realckpt -v
set -euo pipefail

DATASET="${1:?dataset (nsclc|rcc)}"
CKPT="${2:?conch checkpoint path}"
FEATURES="${3:?CLAM feature dir (merge_features_conch)}"
RESULT_DIR="${4:-results/parity/${DATASET}}"
TOKENIZER="${5:-}"

# 1) converter + weight-build drill (skips cleanly if torch ckpt unreadable)
MOC_TPU_CONCH_CKPT="${CKPT}" \
${TOKENIZER:+MOC_TPU_CONCH_TOKENIZER="${TOKENIZER}"} \
MOC_TPU_FEATURES_$(echo "${DATASET}" | tr a-z A-Z)="${FEATURES}" \
  python -m pytest tests/test_realckpt.py -m realckpt -v

# 2) the real sweep: vendored dataset_csv + splits + prompt banks; the
#    feature dir is the only external input besides the checkpoint.
DATA_ROOT="$(mktemp -d)"
mkdir -p "${DATA_ROOT}/data/${DATASET}"
ln -s "$(readlink -f "${FEATURES}")" "${DATA_ROOT}/data/${DATASET}/merge_features_conch"

# shots 1-8 mirror summary_{shot}.csv; 16 is the BASELINE.json north-star
# operating point (16-shot AUC within 0.5 pt) — split files are vendored.
python -m moc_tpu.cli.sweep \
  --dataset "${DATASET}" \
  --shots 1 2 4 8 16 \
  --folds 0 1 2 3 4 \
  --topj 400 --topk 10 \
  --data_root "${DATA_ROOT}" \
  --conch_checkpoint "${CKPT}" \
  ${TOKENIZER:+--tokenizer_file "${TOKENIZER}"} \
  --result_dir "${RESULT_DIR}" \
  --resume

echo "parity summaries: ${RESULT_DIR}/summary_{1,2,4,8}.csv"
