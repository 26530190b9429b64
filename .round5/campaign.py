#!/usr/bin/env python
"""Round-5 campaign: the daemon is warming pose_enc:11 (validated default
kernels) then delay_enc:16 on the round-5 target config (DELAY_ENC_MSM=b16 +
DELAY_ENC_NTT=mxu, flipped by .round4b/flip_watch.py before the delay_enc
warm starts).  This orchestrator:

  1. waits for pose_enc:11, banks an early driver-shaped auto capture
     (guaranteed device metric on disk even if everything later fails);
  2. waits for delay_enc:16 (warmup proof auto-verifies w/ selfcheck);
  3. banks a steady k=16 capture (the headline number, b16+mxu);
     if the warmup proof FAILED verification, bisects via setenv
     (one flag at a time, cheapest-recompile first);
  4. queues mod_pow:16 (shares every compiled shape with delay_enc:16 ->
     minutes, not hours) so bench auto can bank a device mod_pow row;
  5. if the clock allows (< T0+5.0h), queues mod_pow:17 (the reference's
     published row, fresh 2^17/2^20 shapes) -- NEVER later, so an
     in-flight warm cannot collide with the driver's end-of-round bench;
  6. final driver-shaped auto capture + cache-manifest refresh.

Artifacts under .round5/.  Survives the builder session (detached).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from delay_enc_tpu.runtime import daemon_request  # noqa: E402

D = ".round5"
LOG = open(f"{D}/campaign.log", "a", buffering=1)
T0 = time.time()
T_END = T0 + 6 * 3600          # hard campaign end
T_NO_NEW_LONG_WARM = T0 + 1.5 * 3600   # no fresh k=17 warm after this
# (session 2 restart: driver bench lands ~T0+3.5-4h; a fresh 2^17-shape
# warm must never be mid-flight then — mod_pow:16 shares delay_enc:16's
# shapes and stays cheap, so only it is allowed late.)


def log(msg):
    print(f"{time.strftime('%H:%M:%S')} {msg}", file=LOG)


def ping():
    try:
        return daemon_request({"cmd": "ping"}) or {}
    except Exception as e:
        log(f"ping error {e!r}")
        return {}


def wait_warm(key, deadline):
    while time.time() < deadline:
        st = ping()
        if key in st.get("warm", []):
            return st
        log(f"waiting for {key}: warming={st.get('warming')} "
            f"pending={st.get('pending_warm')}")
        time.sleep(120)
    return None


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


def prove(workload, k, repeats, budget_s, tag):
    evs = []
    try:
        fin = daemon_request(
            {"cmd": "prove", "workload": workload, "k": k,
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


log(f"=== round-5 campaign start (T0={time.strftime('%H:%M:%S')}) ===")

# -- 1. pose_enc:11 warm -> early insurance capture ------------------------
if wait_warm("pose_enc:11", T_END - 3600) is None:
    log("pose_enc:11 never warmed inside the window; proceeding anyway")
else:
    auto_capture("s50_auto_early", 900)

# -- 2. delay_enc:16 warm (b16+mxu) ---------------------------------------
st = wait_warm("delay_enc:16", T_END - 1800)
if st is None:
    log("delay_enc:16 never warmed; final pose-only capture")
    auto_capture("s59_auto_final", 1500)
    sys.exit(0)

# -- 3. steady headline capture -------------------------------------------
ok, best = prove("delay_enc", 16, 4, 1200, "s51_delay16_steady")
if not ok:
    # warm landed but proofs don't verify on the flipped config: bisect.
    log("b16+mxu proof not verified -> bisect: revert MSM first")
    daemon_request({"cmd": "setenv", "env": {"DELAY_ENC_MSM": None}})
    ok, best = prove("delay_enc", 16, 2, 2400, "s52_bisect_msm")
    if not ok:
        daemon_request({"cmd": "setenv", "env": {"DELAY_ENC_MSM": "b16",
                                                 "DELAY_ENC_NTT": None}})
        ok, best = prove("delay_enc", 16, 2, 2400, "s53_bisect_ntt")
    if not ok:
        daemon_request({"cmd": "setenv", "env": {"DELAY_ENC_MSM": None,
                                                 "DELAY_ENC_NTT": None}})
        ok, best = prove("delay_enc", 16, 2, 3000, "s54_bisect_both")
    if not ok:
        # last suspect: the work-efficient block scan (session-2 change);
        # call-time dispatch makes this flippable in-process
        daemon_request({"cmd": "setenv", "env": {"DELAY_ENC_MSM": "b16",
                                                 "DELAY_ENC_NTT": "mxu",
                                                 "DELAY_ENC_SCAN": "hs"}})
        ok, best = prove("delay_enc", 16, 2, 2400, "s54b_bisect_scan")
log(f"headline steady: verified={ok} best={best}")

# -- 4. cheap extra rows: mod_pow:16 shares delay_enc:16's shapes ----------
st = daemon_request({"cmd": "set_warm", "warm": "mod_pow:16"}) or {}
log(f"queued mod_pow:16: {st}")
if wait_warm("mod_pow:16", time.time() + 3600):
    prove("mod_pow", 16, 3, 600, "s55_modpow16_steady")

# -- 5. the reference's mod_pow row (k=17) only if the clock allows --------
if time.time() < T_NO_NEW_LONG_WARM:
    st = daemon_request({"cmd": "set_warm", "warm": "mod_pow:17"}) or {}
    log(f"queued mod_pow:17: {st}")
    if wait_warm("mod_pow:17", T_NO_NEW_LONG_WARM + 2.5 * 3600):
        prove("mod_pow", 17, 3, 900, "s56_modpow17_steady")
else:
    log("skipping mod_pow:17 (past the no-new-long-warm cutoff)")

# -- 6. final driver-shaped capture + manifest -----------------------------
auto_capture("s59_auto_final", 1500)
try:
    subprocess.run([sys.executable, "bench.py", "--write-cache-manifest"],
                   timeout=120)
except Exception as e:
    log(f"manifest refresh failed: {e!r}")
log("=== round-5 campaign end ===")
