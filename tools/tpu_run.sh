#!/usr/bin/env bash
# Tenant-safe TPU job runner (VERDICT round-3 item 6).
#
# The axon relay serves ONE tenant; a client killed mid-compile can take
# the chip offline for hours (round-3 outage). Every TPU job therefore
# goes through this script, which
#   1. serializes jobs behind an flock (no concurrent tenants),
#   2. journals start/end/rc + full output under bench_artifacts/,
#   3. never delivers SIGKILL to a compiling client: `timeout` sends
#      SIGTERM first and the 120s KILL grace lets jax disconnect cleanly.
#
# Usage:  tools/tpu_run.sh <label> [timeout_s] -- <command...>
#   e.g.  tools/tpu_run.sh parity_serving 3600 -- \
#             python tools/parity_psnr.py jax serving
#
# Output: bench_artifacts/<label>.log (full output),
#         bench_artifacts/journal.tsv (one line per run).

set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
ART="$ROOT/bench_artifacts"
LOCK="/tmp/vidtok_tpu.lock"
mkdir -p "$ART"

LABEL="${1:?label required}"; shift
TIMEOUT_S=3600
if [[ "${1:-}" != "--" ]]; then TIMEOUT_S="$1"; shift; fi
[[ "${1:-}" == "--" ]] && shift

LOG="$ART/${LABEL}.log"
JOURNAL="$ART/journal.tsv"

exec 9>"$LOCK"
if ! flock -w 14400 9; then
  echo "$(date -u +%FT%TZ)\t$LABEL\tLOCK_TIMEOUT" >> "$JOURNAL"
  echo "tpu_run: could not acquire TPU lock within 4h" >&2
  exit 75
fi

START="$(date -u +%FT%TZ)"
echo "=== tpu_run $LABEL start $START timeout=${TIMEOUT_S}s" | tee "$LOG"
echo "cmd: $*" | tee -a "$LOG"
T0=$SECONDS
# SIGTERM at timeout, SIGKILL only 120s later: a killed-mid-compile client
# is what stranded the round-3 relay.
timeout --signal=TERM --kill-after=120 "$TIMEOUT_S" "$@" >> "$LOG" 2>&1
RC=$?
DUR=$((SECONDS - T0))
echo "=== tpu_run $LABEL end rc=$RC dur=${DUR}s" | tee -a "$LOG"
printf '%s\t%s\trc=%d\tdur=%ds\tcmd=%s\n' "$START" "$LABEL" "$RC" "$DUR" "$*" >> "$JOURNAL"
exit $RC
