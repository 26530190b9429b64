#!/bin/bash
# Restart the warm prover daemon if it dies; keeps the driver-facing
# serving path alive through the round end.
cd /root/repo
WARM="${DAEMON_WARM:-pose_enc:11,delay_enc:16}"
while true; do
  PID=$(awk '{print $3}' .round4/daemon_pid 2>/dev/null)
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    echo "$(date -u +%FT%TZ) daemon dead -> restarting (warm=$WARM)"
    nohup python -m delay_enc_tpu.runtime.daemon --warm "$WARM" \
      >> .round4/daemon_restart.log 2>&1 &
    echo "daemon pid $!" > .round4/daemon_pid
  fi
  sleep 120
done
