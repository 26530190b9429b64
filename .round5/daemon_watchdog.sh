#!/bin/bash
# Round-5 watchdog: restart the warm daemon if it dies, and re-arm the
# b16+mxu flip watcher (a restarted daemon loses its setenv flips; the
# watcher re-applies them the moment pose_enc:11 is warm / delay_enc:16
# starts warming, so the delay_enc shapes compiled are ALWAYS the round-5
# target config).
cd /root/repo
PY=/opt/venv/bin/python
WARM="${DAEMON_WARM:-pose_enc:11,delay_enc:16}"
while true; do
  PID=$(cat .round5/daemon_pid 2>/dev/null)
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    echo "$(date -u +%FT%TZ) daemon dead -> restarting (warm=$WARM)"
    nohup $PY -m delay_enc_tpu.runtime.daemon --warm "$WARM" \
      >> .round5/daemon_restart.log 2>&1 &
    sleep 5
    pgrep -f "delay_enc_tpu.runtime.daemon" | head -1 > .round5/daemon_pid
    PYTHONPATH=/root/repo nohup $PY .round4b/flip_watch.py \
      >> .round5/flip_watch.log 2>&1 &
  fi
  sleep 120
done
