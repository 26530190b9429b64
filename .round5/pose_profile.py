"""Grab a per-phase profile of warm pose_enc:11 proofs from the daemon
(phases_s rides in each repeat event) — data for the k=11 latency analysis
(0.54 s vs the reference's 0.1397 s laptop row)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from delay_enc_tpu.runtime import daemon_request

evs = []
fin = daemon_request(
    {"cmd": "prove", "workload": "pose_enc", "k": 11, "repeats": 8,
     "budget_s": 180},
    on_event=evs.append, timeout=300)
out = {"events": evs, "final": fin}
with open(".round5/pose_profile.json", "w") as f:
    json.dump(out, f, indent=1)
for e in evs:
    if e.get("event") == "repeat":
        print(f"repeat {e.get('i')}: {e.get('seconds'):.3f}s")
        ph = e.get("phases_s") or {}
        for k, v in sorted(ph.items(), key=lambda kv: -kv[1]):
            print(f"   {k:28s} {v:.4f}")
print("final:", {k: v for k, v in (fin or {}).items() if k != "proof_hex"})
