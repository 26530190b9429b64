"""Benchmark driver: proves the reference's headline workload and prints one
JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline: delay_enc full PVDE proof (2048-bit modulus, 5-bit exponent
window, msg=2) at k=16 — reference baseline 3.7977 s proving time on Apple
M1 Pro CPU (benches/README.md:57, BASELINE.md).

Usage: python bench.py [--workload delay_enc|mod_pow|pose_enc] [--k K]
Artifacts (SRS) are cached under ./bench_data (reference caches under
benches/data, delay_enc.rs:39-54).
"""

import argparse
import json
import os
import sys
import time

import numpy as np


BASELINES = {
    # (workload, k) -> seconds from BASELINE.md
    ("delay_enc", 16): 3.7977,
    ("delay_enc", 17): 7.4216,
    ("mod_pow", 16): 3.5665,  # k=16 5-bit T row
    ("pose_enc", 11): 0.13967,
}


def build_circuit(workload: str):
    from delay_enc_tpu.fields import FR
    from delay_enc_tpu.poseidon import get_spec

    rng = np.random.default_rng(42)
    spec = get_spec(FR, 5, 4, 8, 57)

    def rand_bits(bits):
        v = 0
        while v.bit_length() != bits:
            v = int.from_bytes(bytes(rng.integers(0, 256, bits // 8, dtype="uint8")), "little")
        return v

    if workload == "pose_enc":
        from delay_enc_tpu.encryption import PoseidonCipher
        from delay_enc_tpu.models import PoseidonEncCircuit

        key = (FR.random(rng), FR.random(rng))
        expected = PoseidonCipher(spec, key).encrypt([0, 0], 1)
        return PoseidonEncCircuit(
            spec=spec, num_input=2, message=[0, 0], key=key, expected=expected
        ).build()
    n = rand_bits(2048)
    e = int(rng.integers(1, 32))  # 5-bit exponent window (lib.rs:124)
    x = rand_bits(2048) % n
    if workload == "mod_pow":
        from delay_enc_tpu.models import RSACircuit

        return RSACircuit(n=n, e=e, x=x, field=FR).build()
    from delay_enc_tpu.models import DelayEncryptCircuit

    return DelayEncryptCircuit(
        n=n, e=e, x=x, spec=spec, num_input=2, message=[0, 0]
    ).build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="delay_enc",
                    choices=["delay_enc", "mod_pow", "pose_enc"])
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import delay_enc_tpu  # noqa: F401
    from delay_enc_tpu.plonk import SRS, create_proof, keygen, verify_proof
    from delay_enc_tpu.plonk.keygen import min_k

    t0 = time.time()
    builder = build_circuit(args.workload)
    build_s = time.time() - t0
    k = args.k or max(min_k(builder), {"pose_enc": 11, "mod_pow": 16, "delay_enc": 16}[args.workload])
    print(f"# {args.workload}: rows={builder.rows} k={k} build={build_s:.2f}s",
          file=sys.stderr)

    t0 = time.time()
    srs = SRS.setup(k, cache_dir="bench_data")
    print(f"# srs setup {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    import hashlib

    from delay_enc_tpu.plonk.serialize import load_pk, save_pk

    h = hashlib.blake2b(digest_size=16)
    h.update(f"{args.workload}:{k}:{builder.rows}".encode())
    for name in ("q_a", "q_mul_ab", "q_constant", "tag_a"):
        h.update(str(builder.fixed[name][:2048]).encode())
    key_path = os.path.join("bench_data", f"keys_{args.workload}_{h.hexdigest()}")
    if os.path.exists(key_path + ".pk.npz"):
        pk = load_pk(key_path)
        vk = pk.vk
        print(f"# keygen (cached) {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        pk, vk = keygen(builder, srs, k=k)
        try:
            save_pk(pk, key_path)
        except Exception as e:
            print(f"# pk cache save failed: {e}", file=sys.stderr)
        print(f"# keygen {time.time()-t0:.1f}s", file=sys.stderr)

    # warm-up (compiles cached after the first proof)
    t0 = time.time()
    proof = create_proof(srs, pk, builder, np.random.default_rng(0))
    print(f"# prove warmup {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        proof = create_proof(srs, pk, builder, np.random.default_rng(i + 1))
        times.append(time.time() - t0)
    prove_s = min(times)

    t0 = time.time()
    ok = verify_proof(srs, vk, proof)
    verify_s = time.time() - t0
    assert ok, "proof failed to verify"
    print(f"# verify {verify_s:.2f}s ok; proof {len(proof)}B", file=sys.stderr)

    baseline = BASELINES.get((args.workload, k))
    print(json.dumps({
        "metric": f"{args.workload}_k{k}_prove_s",
        "value": round(prove_s, 4),
        "unit": "s",
        "vs_baseline": round(baseline / prove_s, 3) if baseline else None,
    }))


if __name__ == "__main__":
    main()
