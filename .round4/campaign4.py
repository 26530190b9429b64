#!/usr/bin/env python
"""Round-4 late campaign: wait for the daemon's delay_enc:16 warm, bank a
driver-shaped auto capture, then probe the base-16 MSM path in-process via
the daemon's setenv control and keep whichever variant is faster AND
verified.  Runs detached so it survives the builder session; every step
appends artifacts under .round4/.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from delay_enc_tpu.runtime import daemon_request  # noqa: E402

D = ".round4"
LOG = open(f"{D}/campaign4.log", "a", buffering=1)


def log(msg):
    print(f"{time.strftime('%H:%M:%S')} {msg}", file=LOG)


def ping():
    try:
        return daemon_request({"cmd": "ping"}) or {}
    except Exception as e:
        log(f"ping error {e!r}")
        return {}


def wait_warm(key, deadline_s):
    t_end = time.time() + deadline_s
    while time.time() < t_end:
        st = ping()
        if key in st.get("warm", []):
            return True
        log(f"waiting for {key}: {st.get('warming')} pending={st.get('pending_warm')}")
        time.sleep(120)
    return False


def prove(repeats, budget_s, tag):
    evs = []
    fin = daemon_request(
        {"cmd": "prove", "workload": "delay_enc", "k": 16,
         "repeats": repeats, "budget_s": budget_s},
        on_event=evs.append, timeout=budget_s + 120)
    with open(f"{D}/{tag}.json", "w") as f:
        json.dump({"events": evs, "final": fin}, f)
    ok = bool(fin) and fin.get("event") == "done" and fin.get("verified")
    best = fin.get("best_s") if ok else None
    log(f"{tag}: verified={ok} best={best}")
    return ok, best


log("=== campaign4 start ===")
if not wait_warm("delay_enc:16", 4 * 3600):
    log("delay_enc:16 never warmed; exiting")
    sys.exit(1)

# 1) driver-shaped auto capture (banks verify + pose_enc + delay_enc)
log("auto capture start")
try:
    r = subprocess.run(
        [sys.executable, "bench.py", "--budget", "1500"],
        stdout=open(f"{D}/s30_auto.json", "w"),
        stderr=open(f"{D}/s30_auto.log", "w"), timeout=1800)
    log(f"auto capture rc={r.returncode}")
except Exception as e:
    log(f"auto capture failed: {e!r}")

# 2) steady b4 reference number from the daemon
ok4, best4 = prove(3, 600, "s31_b4_steady")

# 3) b16 probe: flip the MSM variant in-process (executables stay loaded),
#    give the fresh compiles a generous budget, verify client-side
st = daemon_request({"cmd": "setenv", "env": {"DELAY_ENC_MSM": "b16"}})
log(f"setenv b16 -> {st and st.get('applied')}")
ok16, best16 = prove(3, 3300, "s32_b16_probe")

decision = {"b4": best4, "b16": best16, "b16_verified": ok16}
if ok16 and ok4 and best16 < best4:
    decision["keep"] = "b16"
    log(f"KEEP b16: {best16:.2f}s < {best4:.2f}s")
else:
    daemon_request({"cmd": "setenv", "env": {"DELAY_ENC_MSM": None}})
    decision["keep"] = "b4"
    log(f"revert to b4 (b16 ok={ok16} best={best16})")
    # confirm the daemon still serves healthy b4 proofs post-revert
    prove(1, 300, "s33_b4_confirm")
with open(f"{D}/b16_decision.json", "w") as f:
    json.dump(decision, f)
log("=== campaign4 end ===")
