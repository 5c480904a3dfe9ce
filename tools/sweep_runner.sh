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
# stream_session_window materializes a corpus-sized result in its
# complete-mode memory sink; at sf10 the default 8g driver heap can
# OOM the task-result-getter and WEDGE the JVM (round 13). 12g is the
# measured-safe default; -Xmx is a cap, not committed memory, so this
# costs nothing at small sfs.
export SPARK_GRAFT_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-12g}
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
    # hard crash/timeout. Only blame a query when it crashed ALONE:
    # with CHUNK>1 the per-chunk timeout is cumulative, so a chunk of
    # individually-fine slow queries can time out and the first
    # unfinished name would be blamed (and silently dropped from the
    # sweep). Re-run the survivors one at a time instead; a name whose
    # 1-query run also dies gets the CRASH verdict for real.
    if [ "$CHUNK" -eq 1 ]; then
      for n in $names; do
        if grep -qx "$n" "$TODO"; then
          echo "CRASH $n: process rc=$rc" >> "$LOG"
          grep -vx "$n" "$TODO" > "$TODO.tmp" || true; mv "$TODO.tmp" "$TODO"
          break
        fi
      done
    else
      for n in $names; do
        if grep -qx "$n" "$TODO"; then
          timeout "${SWEEP_TIMEOUT:-5400}" python tools/check_queries.py "$n" \
            >> "$LOG" 2>> "$LOG.err"
          rc1=$?
          if grep -qE "^(OK|FAIL|ERR)  ?${n}:" "$LOG"; then
            grep -vx "$n" "$TODO" > "$TODO.tmp" || true; mv "$TODO.tmp" "$TODO"
          elif [ "$rc1" -ne 0 ] && [ "$rc1" -ne 1 ]; then
            echo "CRASH $n: process rc=$rc1 (solo re-run)" >> "$LOG"
            grep -vx "$n" "$TODO" > "$TODO.tmp" || true; mv "$TODO.tmp" "$TODO"
          fi
        fi
      done
    fi
  fi
done
echo "SWEEP DONE $(wc -l < "$LOG") log lines" >> "$LOG"
# post-sweep vacuum (round 13): drop regenerable run artifacts so
# .tmp stays bounded across rounds/sfs. Skippable for concurrent
# sweeps via SWEEP_NO_VACUUM=1 (vacuum only when the LAST worker
# finishes; see tools/vacuum_artifacts.py for what goes and why).
if [ -z "${SWEEP_NO_VACUUM:-}" ]; then
  python tools/vacuum_artifacts.py >> "$LOG" 2>&1 || true
fi
