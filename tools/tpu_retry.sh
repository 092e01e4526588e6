#!/bin/bash
# Run a TPU job with wedge-tolerant retries (CLAUDE.md: a killed client can
# wedge the chip claim 20+ min; fresh clients hang at backend init then die
# with UNAVAILABLE). Usage: tools/tpu_retry.sh LOGFILE CMD [ARGS...]
# Retries on UNAVAILABLE / backend-init failure, sleeping 900 s between
# attempts; any other failure (or success) stops. Appends to LOGFILE so
# partial rows from earlier attempts survive.
set -u
LOG="$1"; shift
for attempt in 1 2 3 4 5 6; do
  echo "=== tpu_retry attempt $attempt $(date +%H:%M:%S) ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== tpu_retry ok (attempt $attempt) ===" >> "$LOG"
    exit 0
  fi
  if grep -q "UNAVAILABLE\|Unable to initialize backend\|FAILED_PRECONDITION\|DEADLINE_EXCEEDED" "$LOG"; then
    echo "=== tpu_retry rc=$rc wedged; sleeping 900 ===" >> "$LOG"
    sleep 900
  else
    echo "=== tpu_retry rc=$rc non-transient; giving up ===" >> "$LOG"
    exit $rc
  fi
done
echo "=== tpu_retry exhausted ===" >> "$LOG"
exit 1
