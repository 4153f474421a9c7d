#!/bin/bash
# Run a TPU python script with a first-progress watchdog: if the log shows no
# progress line within WATCH seconds, kill and retry (the axon relay sometimes
# wedges a client at backend init; fresh processes succeed).
# Progress = a line containing "[" that is NOT a watchdog message (the
# watchdog's own lines must not satisfy their own check).
SCRIPT=$1; LOG=$2; WATCH=${3:-150}; TRIES=${4:-4}; TOTAL=${5:-540}
progress() { grep -v '^WATCHDOG' "$LOG" | grep -q "\["; }
for i in $(seq 1 $TRIES); do
  : > "$LOG"
  timeout -k 10 $TOTAL python "$SCRIPT" >> "$LOG" 2>&1 &
  PID=$!
  SECS=0
  while kill -0 $PID 2>/dev/null; do
    sleep 10; SECS=$((SECS+10))
    if [ $SECS -ge $WATCH ] && ! progress; then
      echo "WATCHDOG: no progress after ${SECS}s, killing (attempt $i)" >> "$LOG"
      kill -9 $PID 2>/dev/null; wait $PID 2>/dev/null
      sleep 20
      break
    fi
  done
  if progress; then
    wait $PID 2>/dev/null
    exit 0
  fi
done
echo "WATCHDOG: giving up after $TRIES attempts" >> "$LOG"
exit 1
