#!/bin/bash
# Run a TPU python script with a first-progress watchdog: if the log shows no
# progress line within WATCH seconds, kill and retry (the axon relay sometimes
# wedges a client at backend init; fresh processes succeed). A FAST failure
# (register() dying at interpreter boot: "axon is not in the list of known
# backends") retries with a 30s backoff — those outages come in windows.
# Progress = a line containing "[" that is NOT a watchdog message. NOTE: the
# fast-failure traceback itself contains "['cpu', 'tpu']", so success is
# decided by the script's EXIT CODE, never by the progress check alone
# (an earlier version exited 0 on a crashed script because of exactly that).
SCRIPT=$1; LOG=$2; WATCH=${3:-150}; TRIES=${4:-4}; TOTAL=${5:-540}
# SCRIPT may carry arguments ("script.py --flag x"). Run it through sh -c so
# word-splitting is deliberate and glob metacharacters in args survive —
# the old unquoted `python $SCRIPT` glob-expanded the whole string.
progress() { grep -v '^WATCHDOG' "$LOG" | grep -q "\["; }
for i in $(seq 1 $TRIES); do
  : > "$LOG"
  # setsid: the attempt (timeout -> sh -> python) runs as its own process
  # group so the watchdog can kill the WHOLE tree with kill -- -$PID.
  # An earlier version killed only the timeout wrapper, orphaning the
  # python grandchild — which kept the wedged TPU client alive and blocked
  # every retry (and any other chip user) behind it.
  setsid timeout -k 10 $TOTAL sh -c "exec python $SCRIPT" >> "$LOG" 2>&1 &
  PID=$!
  SECS=0
  KILLED=0
  while kill -0 $PID 2>/dev/null; do
    sleep 10; SECS=$((SECS+10))
    if [ $SECS -ge $WATCH ] && ! progress; then
      echo "WATCHDOG: no progress after ${SECS}s, killing group (attempt $i)" >> "$LOG"
      kill -9 -- -$PID 2>/dev/null
      KILLED=1
      break
    fi
  done
  wait $PID 2>/dev/null
  RC=$?
  kill -9 -- -$PID 2>/dev/null  # reap any stragglers in the group
  if [ $KILLED -eq 0 ] && [ $RC -eq 0 ]; then
    exit 0
  fi
  if [ $KILLED -eq 0 ]; then
    echo "WATCHDOG: script exited rc=$RC (attempt $i), retrying" >> "$LOG"
  fi
  sleep 30
done
echo "WATCHDOG: giving up after $TRIES attempts" >> "$LOG"
exit 1
