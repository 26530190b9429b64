"""Measured multi-device scaling: B=8 pose_enc k=11 proofs DP-sharded
across D in {1,2,4,8} virtual CPU devices (BASELINE configs 4/5's own bar;
the analytic model lives in docs/SCALING.md — this script produces the
MEASURED companion table).

Each D runs in a fresh subprocess (jax_num_cpu_devices must be set before
backend init).  Prints one JSON line per D and a final table.

Usage: python tools/scaling_curve.py [--b 8] [--reps 2] [--child D]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)  # the script lives in tools/, the package at ROOT


def child(d: int, b: int, reps: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(d, 1))
    import numpy as np

    from delay_enc_tpu.encryption import PoseidonCipher
    from delay_enc_tpu.fields import FR
    from delay_enc_tpu.models import PoseidonEncCircuit
    from delay_enc_tpu.parallel import make_mesh
    from delay_enc_tpu.plonk import SRS, keygen, verify_proofs_batched
    from delay_enc_tpu.plonk.batch_prover import create_proofs_batched
    from delay_enc_tpu.poseidon import get_spec

    rng = np.random.default_rng(5)
    spec = get_spec(FR, 5, 4, 8, 57)
    key = (FR.random(rng), FR.random(rng))
    expected = PoseidonCipher(spec, key).encrypt([0, 0], 1)
    pose = PoseidonEncCircuit(
        spec=spec, num_input=2, message=[0, 0], key=key, expected=expected
    ).build()
    srs = SRS.setup(11, tau=424244)
    pk, vk = keygen(pose, srs, k=11)
    mesh = make_mesh(d) if d > 1 else None
    kw = dict(mesh=mesh, axis=mesh.axis_names[0]) if mesh else {}
    # warm-up (compile), then timed repeats
    create_proofs_batched(srs, pk, [pose] * b, np.random.default_rng(0), **kw)
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        proofs = create_proofs_batched(
            srs, pk, [pose] * b, np.random.default_rng(r + 1), **kw)
        best = min(best, time.time() - t0)
    assert verify_proofs_batched(srs, vk, proofs)
    print(json.dumps({"D": d, "B": b, "batch_s": round(best, 3),
                      "proofs_per_s": round(b / best, 3)}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--child", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.b, args.reps)
        return
    rows = []
    for d in (int(x) for x in args.devices.split(",")):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(d),
             "--b", str(args.b), "--reps", str(args.reps)],
            capture_output=True, text=True, cwd=ROOT, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"# D={d} failed:\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1], flush=True)
    if rows:
        t1 = rows[0]["batch_s"] * rows[0]["D"] / rows[0]["B"] * args.b
        print("\n| D | batch_s (B=%d) | proofs/s | efficiency vs D=1 |"
              % args.b)
        print("|---|---|---|---|")
        for r in rows:
            eff = (rows[0]["batch_s"] / r["batch_s"]) / (r["D"] / rows[0]["D"])
            print(f"| {r['D']} | {r['batch_s']} | {r['proofs_per_s']} "
                  f"| {eff:.2f} |")


if __name__ == "__main__":
    main()
