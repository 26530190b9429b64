"""Watch the daemon; the moment pose_enc:11 is warm (i.e. the delay_enc:16
warm is about to start), flip the kernel-variant env to the round-5 target
config (base-16 MSM + MXU matmul NTT) so the multi-hour delay_enc warm
compiles THOSE shapes.  Post-wipe there is no sunk compile cache to
preserve — warming the old b4+Stockham config would reproduce a measured
8.3 s loser, while b16+mxu is the projected path under the 3.7977 s
baseline (docs/ROADMAP.md round-5 plan items 1-2)."""
import json
import sys
import time

from delay_enc_tpu.runtime import daemon_request


def log(m):
    print(f"{time.strftime('%H:%M:%S')} {m}", flush=True)


log("flip_watch start")
while True:
    try:
        st = daemon_request({"cmd": "ping"}) or {}
    except Exception as e:  # daemon restarting — keep polling
        log(f"ping failed: {e}")
        time.sleep(10)
        continue
    warm = st.get("warm") or []
    warming = st.get("warming")
    if "pose_enc:11" in warm or warming == "delay_enc:16":
        st2 = daemon_request({"cmd": "setenv", "env": {
            "DELAY_ENC_MSM": "b16", "DELAY_ENC_NTT": "mxu"}})
        log(f"FLIPPED: applied={st2 and st2.get('applied')} "
            f"warm={warm} warming={warming}")
        with open(".round4b/flip_done.json", "w") as f:
            json.dump({"t": time.time(), "warm": warm,
                       "warming": warming}, f)
        sys.exit(0)
    log(f"waiting: warming={warming} warm={warm} "
        f"pending={st.get('pending_warm')}")
    time.sleep(5)
