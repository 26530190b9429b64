"""One-shot: the moment the insurance capture (s50_auto_early.json) exists
AND pose_enc:11 is warm, kill the daemon so the watchdog restarts it on the
session-2 code (work-efficient block scans in the gp/gwc kernels).  The
delay_enc:16 warm then compiles the NEW kernels — the only way this round's
headline can include the scan win, since a running daemon never reloads
code.  pose_enc:11 re-warms from .jax_cache (executable reload, not
recompile).  Logs to .round5/restart_after_s50.log."""
import os
import time

from delay_enc_tpu.runtime import daemon_request

D = os.path.dirname(os.path.abspath(__file__))
LOG = open(os.path.join(D, "restart_after_s50.log"), "a", buffering=1)


def log(m):
    print(f"{time.strftime('%H:%M:%S')} {m}", file=LOG)


log("watcher start")
deadline = time.time() + 4 * 3600
while time.time() < deadline:
    # the .json is created at capture SPAWN (stdout redirect); completion
    # is signalled by campaign.log's "auto capture s50_auto_early rc=" line
    try:
        have_s50 = "auto capture s50_auto_early rc=" in open(
            os.path.join(D, "campaign.log")).read()
    except OSError:
        have_s50 = False
    try:
        st = daemon_request({"cmd": "ping"}) or {}
    except Exception as e:
        log(f"ping failed: {e!r}")
        time.sleep(30)
        continue
    warm = st.get("warm") or []
    if have_s50 and "pose_enc:11" in warm:
        pid_path = os.path.join(D, "daemon_pid")
        try:
            pid = int(open(pid_path).read().strip())
        except Exception as e:
            log(f"no daemon pid: {e!r}")
            break
        log(f"s50 banked + pose warm -> killing daemon pid {pid} "
            f"(watchdog restarts on new code)")
        os.kill(pid, 15)
        break
    log(f"waiting: s50={have_s50} warm={warm} "
        f"warming={st.get('warming')}")
    time.sleep(60)
log("watcher done")
