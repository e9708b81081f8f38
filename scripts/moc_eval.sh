#!/usr/bin/env bash
# Summarize a finished sweep into summary_{shot}.csv files
# (analogue of /root/reference/scripts/moc_eval.sh + --summary mode).
set -euo pipefail

SUMMARY_DIR="${1:?usage: scripts/moc_eval.sh <result_dir>}"
python -m moc_tpu.cli.main_moc --summary --summary_dir "${SUMMARY_DIR}"
