#!/usr/bin/env bash
# Launch N processes of a moc_tpu CLI joined into ONE JAX runtime on this
# host — the torchrun analogue for parallel.runtime (MOC_TPU_* env vars).
#
#   scripts/pod_launch.sh 2 -- python -m moc_tpu.cli.extract_features \
#       --patch_dir ... --out_dir ... --data_parallel
#
# Multi-HOST: run this once per host with MOC_TPU_COORDINATOR=<host0>:<port>
# and MOC_TPU_BASE_RANK=<host_index * procs_per_host> exported, and the
# same total -n on every host is NOT needed — pass total via
# MOC_TPU_NUM_PROCESSES instead. Single-host default: coordinator on
# localhost, ranks 0..N-1.
set -euo pipefail

N=${1:?usage: pod_launch.sh N -- <command...>}
shift
[ "${1:-}" = "--" ] && shift

COORD=${MOC_TPU_COORDINATOR:-localhost:${MOC_TPU_PORT:-12355}}
TOTAL=${MOC_TPU_NUM_PROCESSES:-$N}
BASE=${MOC_TPU_BASE_RANK:-0}

pids=()
for i in $(seq 0 $((N - 1))); do
  MOC_TPU_COORDINATOR="$COORD" \
  MOC_TPU_NUM_PROCESSES="$TOTAL" \
  MOC_TPU_PROCESS_ID="$((BASE + i))" \
  "$@" &
  pids+=($!)
done

rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=1
done
exit $rc
