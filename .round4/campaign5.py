#!/usr/bin/env python
"""Round-4 late campaign v2: wait for the daemon's delay_enc:16 warm, bank a
driver-shaped auto capture, then probe kernel variants in-process via the
daemon's setenv control (base-16 MSM, then the MXU matmul NTT), keeping a
variant only when it is faster AND the proof verifies client-side.  If the
warm never lands, still bank an auto capture (pose_enc steady + verify).
Runs detached so it survives the builder session; artifacts under .round4/.
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
LOG = open(f"{D}/campaign5.log", "a", buffering=1)
T_END = time.time() + 6 * 3600


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


def auto_capture(tag, budget):
    log(f"auto capture {tag} start (budget {budget})")
    try:
        r = subprocess.run(
            [sys.executable, "bench.py", "--budget", str(budget)],
            stdout=open(f"{D}/{tag}.json", "w"),
            stderr=open(f"{D}/{tag}.log", "w"), timeout=budget + 300)
        log(f"auto capture {tag} rc={r.returncode}")
    except Exception as e:
        log(f"auto capture {tag} failed: {e!r}")


def prove(repeats, budget_s, tag):
    evs = []
    try:
        fin = daemon_request(
            {"cmd": "prove", "workload": "delay_enc", "k": 16,
             "repeats": repeats, "budget_s": budget_s},
            on_event=evs.append, timeout=budget_s + 120)
    except Exception as e:
        log(f"{tag}: request failed {e!r}")
        fin = None
    with open(f"{D}/{tag}.json", "w") as f:
        json.dump({"events": evs, "final": fin}, f)
    ok = bool(fin) and fin.get("event") == "done" and fin.get("verified")
    best = fin.get("best_s") if ok else None
    log(f"{tag}: verified={ok} best={best}")
    return ok, best


def probe_variant(name, env, base_best, budget_s, tag):
    """Flip env in-daemon, prove, keep iff verified and faster; else revert."""
    if time.time() + budget_s > T_END:
        log(f"{tag}: skipped (campaign deadline)")
        return None
    st = daemon_request({"cmd": "setenv", "env": env})
    log(f"setenv {env} -> {st and st.get('applied')}")
    ok, best = prove(3, budget_s, tag)
    keep = bool(ok and base_best and best and best < base_best)
    if not keep:
        daemon_request({"cmd": "setenv", "env": {k: None for k in env}})
        log(f"{name}: revert (ok={ok} best={best} vs {base_best})")
        prove(1, 600, f"{tag}_revert_confirm")
    else:
        log(f"KEEP {name}: {best:.2f}s < {base_best:.2f}s")
    with open(f"{D}/{tag}_decision.json", "w") as f:
        json.dump({"variant": name, "base": base_best, "best": best,
                   "verified": ok, "keep": keep}, f)
    return best if keep else base_best


log("=== campaign5 start ===")
if not wait_warm("delay_enc:16", T_END - time.time() - 1800):
    log("delay_enc:16 never warmed; banking pose-only capture")
    auto_capture("s40_auto_poseonly", 1500)
    sys.exit(0)

# 1) driver-shaped auto capture (banks verify + pose_enc + delay_enc)
auto_capture("s40_auto", 1500)

# 2) steady default-variant reference number from the daemon
ok0, best0 = prove(3, 900, "s41_base_steady")

# 3) kernel-variant probes, cheapest-compile first (ROADMAP items 1-2):
#    base-16 MSM (tables disk/device-cached), then the MXU matmul NTT
best = probe_variant("b16", {"DELAY_ENC_MSM": "b16"}, best0, 3300,
                     "s42_b16_probe") or best0
probe_variant("ntt_mxu", {"DELAY_ENC_NTT": "mxu"}, best, 3600,
              "s43_nttmxu_probe")
log("=== campaign5 end ===")
