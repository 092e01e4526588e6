#!/bin/bash
# Run a TPU job with wedge-tolerant retries (CLAUDE.md: a killed client can
# wedge the chip claim 20+ min; fresh clients hang at backend init then die
# with UNAVAILABLE). Usage: tools/tpu_retry.sh LOGFILE CMD [ARGS...]
# Retries on transient backend markers, sleeping 900 s between attempts; any
# other failure (or success) stops. Appends to LOGFILE so partial rows from
# earlier attempts survive. Only THIS attempt's output is checked for the
# transient markers — a stale marker from an earlier attempt (or an earlier
# queue phase sharing the log) must not convert a real bug into 6x900 s of
# retries (r5 code review).
set -u
LOG="$1"; shift
for attempt in 1 2 3 4 5 6; do
  echo "=== tpu_retry attempt $attempt $(date +%H:%M:%S) ===" >> "$LOG"
  offset=$(wc -c < "$LOG")
  "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== tpu_retry ok (attempt $attempt) ===" >> "$LOG"
    exit 0
  fi
  if tail -c +$((offset + 1)) "$LOG" | grep -q "UNAVAILABLE\|Unable to initialize backend\|FAILED_PRECONDITION\|DEADLINE_EXCEEDED"; then
    echo "=== tpu_retry rc=$rc wedged; sleeping 900 ===" >> "$LOG"
    sleep 900
  else
    echo "=== tpu_retry rc=$rc non-transient; giving up ===" >> "$LOG"
    exit $rc
  fi
done
echo "=== tpu_retry exhausted ===" >> "$LOG"
exit 1
