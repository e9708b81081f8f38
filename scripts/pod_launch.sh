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

# Each rank runs in its OWN process group (setsid) so teardown reaches its
# whole subtree, not just the immediate child.
SETSID=""
command -v setsid > /dev/null && SETSID="setsid"

pids=()
for i in $(seq 0 $((N - 1))); do
  MOC_TPU_COORDINATOR="$COORD" \
  MOC_TPU_NUM_PROCESSES="$TOTAL" \
  MOC_TPU_PROCESS_ID="$((BASE + i))" \
  $SETSID "$@" &
  pids+=($!)
done

# Reap in completion order; on the FIRST failure kill the sibling groups so
# a rank that died at startup (bad flag, import error) cannot leave the
# others blocked forever inside jax.distributed.initialize / a collective.
rc=0
for _ in "${pids[@]}"; do
  if ! wait -n; then
    if [ "$rc" -eq 0 ]; then
      rc=1
      for p in "${pids[@]}"; do
        if [ -n "$SETSID" ]; then kill -TERM -- "-$p" 2>/dev/null || true
        else kill -TERM "$p" 2>/dev/null || true; fi
      done
    fi
  fi
done
exit $rc
