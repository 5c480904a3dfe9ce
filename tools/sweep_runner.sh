#!/bin/bash
# Crash-resilient chunked sweep: runs tools/check_queries.py over the
# names in TODO_FILE, CHUNK at a time, each chunk in its own process so
# a JVM/worker death loses at most the crashing query (recorded as
# CRASH) and the sweep continues with the rest. Names are removed from
# TODO_FILE as their OK/FAIL/ERR line lands in LOG_FILE, so the sweep
# is resumable: re-running the script picks up exactly where it died.
#
# Usage: SPARK_GRAFT_SF_DIR=... tools/sweep_runner.sh TODO_FILE LOG_FILE [CHUNK]
set -u
TODO=$1
LOG=$2
CHUNK=${3:-8}
cd "$(dirname "$0")/.."

# startup purge: drop names whose verdict already landed in LOG, so a
# killed-and-relaunched runner never re-runs completed queries
if [ -f "$LOG" ]; then
  while read -r n; do
    [ -n "$n" ] || continue
    if grep -qE "^(OK|FAIL|ERR)  ?${n}:" "$LOG"; then
      grep -vx "$n" "$TODO" > "$TODO.tmp" || true; mv "$TODO.tmp" "$TODO"
    fi
  done < "$TODO"
fi

while [ -s "$TODO" ]; do
  names=$(head -n "$CHUNK" "$TODO" | tr '\n' ' ')
  timeout "${SWEEP_TIMEOUT:-5400}" python tools/check_queries.py $names \
    >> "$LOG" 2>> "$LOG.err"
  rc=$?
  for n in $names; do
    if grep -qE "^(OK|FAIL|ERR)  ?${n}:" "$LOG"; then
      grep -vx "$n" "$TODO" > "$TODO.tmp" || true; mv "$TODO.tmp" "$TODO"
    fi
  done
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 1 ]; then
    # hard crash/timeout: the first name still in TODO from this chunk
    # is the one that brought the process down — mark it and move on
    for n in $names; do
      if grep -qx "$n" "$TODO"; then
        echo "CRASH $n: process rc=$rc" >> "$LOG"
        grep -vx "$n" "$TODO" > "$TODO.tmp" || true; mv "$TODO.tmp" "$TODO"
        break
      fi
    done
  fi
done
echo "SWEEP DONE $(wc -l < "$LOG") log lines" >> "$LOG"
