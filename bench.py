"""Benchmark driver: proves the reference's headline workloads and prints one
JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Headline: delay_enc full PVDE proof (2048-bit modulus, 5-bit exponent
window, msg=2) at k=16 — reference baseline 3.7977 s proving time on Apple
M1 Pro CPU (benches/README.md:57, BASELINE.md).

Workloads
  delay_enc | mod_pow | pose_enc   end-to-end prove+verify (reference parity)
  batch                            B delay_enc proofs sharing one pk +
                                   compiled kernels (DP amortization;
                                   BASELINE config 5)
  msm | ntt                        standalone kernel sweeps (BASELINE
                                   config 4): MSM points/s and NTT seconds
                                   over 2^16..2^20

Usage: python bench.py [--workload W] [--k K] [--config cfg.json]
                       [--budget SECONDS] [--repeats N]
Artifacts (SRS, pk/vk) are cached under the config's srs_cache_dir
(reference caches under benches/data, delay_enc.rs:39-54).

Cold-start robustness (rounds 2 AND 3 produced rc=124 with no metric —
the warmup proof was un-interruptible inside one process; never again):
  * the default (driver) invocation is the **auto** workload: it emits a
    placeholder JSON line IMMEDIATELY, banks a host-only `verify` metric
    from the cached proof artifact (no device, no compiles — works even
    with the PJRT relay down), then runs pose_enc and delay_enc in
    kill-able SUBPROCESSES with hard deadlines, re-emitting every metric
    line a child produces and a final best line before exiting 0 — the
    consumer parsing the last JSON line always gets the best number so
    far, no matter where an external timeout lands;
  * the strongest banked metric is RE-EMITTED on a <=25 s heartbeat from
    every wait/poll loop (round 4 died waiting on a daemon warm with the
    metric stranded 20 min up the scroll-back — the driver parses only
    the output tail), and handed to child stages via BENCH_BEST_JSON;
  * a wall-clock budget (--budget / BENCH_BUDGET_S, default 2100 s) gates
    every phase including the warmup proof (via the subprocess deadline);
  * the PJRT compile relay is probed with a tiny subprocess jit (with
    retries) before committing to long compiles — the relay has gone down
    for hours under heavy compile load (docs/ROADMAP.md).
"""

import argparse
import json
import os
import queue
import subprocess
import sys
import threading
import time

import numpy as np

START_TIME = time.time()


def vs_baseline_ratio(baseline, t):
    """baseline/t rounded, or None when either is missing/zero.  The t==0
    guard matters: the mid-warm skip path reports a null metric via
    result(0.0), which must not crash the stage (round-5 regression)."""
    return round(baseline / t, 3) if baseline and t else None


def _left(args) -> float:
    return args.budget - (time.time() - START_TIME)


# ---- un-killable metric delivery (rounds 2/3/4 all died inside a wait
# loop with the banked metric stranded minutes up the scroll-back; the
# driver parses only the TAIL of the output) ----------------------------
# The strongest metric emitted so far is re-emitted on a <=25 s heartbeat
# from inside EVERY wait/poll loop, and handed to child stages via
# BENCH_BEST_JSON so even a child stuck waiting on a daemon warm keeps a
# parseable metric as the last stdout line no matter where an external
# kill lands.

_BEST: dict | None = None
_BEST_RANK = -1
_LAST_EMIT = 0.0
HEARTBEAT_S = 25.0


def _rank(metric: str) -> int:
    """Priority of a metric line for heartbeat purposes: never let a weaker
    stage's line displace the banked headline."""
    for pre, r in (("delay_enc_k16_prove", 5), ("delay_enc", 4), ("batch", 4),
                   ("mod_pow", 3), ("pose_enc", 2)):
        if metric.startswith(pre):
            return r
    return 1  # verify / msm / ntt


def _emit(out: dict) -> None:
    """Print the metric line NOW (stdout, flushed).  May be called several
    times with progressively better numbers; consumers take the last line.
    Lines with a non-null value are banked for heartbeat re-emission."""
    global _BEST, _BEST_RANK, _LAST_EMIT
    print(json.dumps(out), flush=True)
    _LAST_EMIT = time.time()
    if out.get("value") is not None and out.get("metric"):
        r = _rank(out["metric"])
        if r >= _BEST_RANK or out["metric"] == (_BEST or {}).get("metric"):
            _BEST = {k: v for k, v in out.items() if k != "heartbeat"}
            _BEST_RANK = max(r, _BEST_RANK)


def heartbeat() -> None:
    """Re-emit the strongest banked metric if stdout has been quiet for a
    heartbeat period.  Call from inside every wait/poll/sleep loop."""
    if _BEST is not None and time.time() - _LAST_EMIT >= HEARTBEAT_S:
        _emit(dict(_BEST, heartbeat=True))


def _seed_best_from_env() -> None:
    """Child stages inherit the parent's best banked metric so their wait
    loops re-emit something real from second zero."""
    raw = os.environ.get("BENCH_BEST_JSON")
    if not raw:
        return
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        return
    if isinstance(d, dict) and d.get("value") is not None and d.get("metric"):
        global _BEST, _BEST_RANK
        _BEST = {k: v for k, v in d.items() if k != "heartbeat"}
        _BEST_RANK = _rank(d["metric"])


def probe_device(args) -> bool:
    """Verify the device backend can compile+run a tiny jit, in a SUBPROCESS
    (a relay outage hangs the call forever — a timeout needs process
    isolation).  Retries while budget remains.  No-op on CPU."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True
    code = (
        "import jax, jax.numpy as jnp;"
        "print(int(jax.jit(lambda v: (v * 2).sum())(jnp.arange(8))))"
    )
    attempt = 0
    while _left(args) > 300:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=min(240, _left(args) - 60),
                capture_output=True,
            )
            if r.returncode == 0 and b"56" in r.stdout:
                print(f"# device probe ok (attempt {attempt}, {time.time()-t0:.0f}s)",
                      file=sys.stderr, flush=True)
                return True
            msg = r.stderr.decode(errors="replace").strip().splitlines()
            print(f"# device probe rc={r.returncode}: {msg[-1] if msg else ''}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# device probe attempt {attempt} timed out "
                  f"(relay down/cold?)", file=sys.stderr, flush=True)
        heartbeat()
        if _left(args) > 360:
            time.sleep(60)
    return False


BASELINES = {
    # (workload, k) -> seconds from BASELINE.md
    ("delay_enc", 16): 3.7977,
    ("delay_enc", 17): 7.4216,
    ("delay_enc", 18): 13.397,
    ("delay_enc", 19): 23.841,
    ("mod_pow", 16): 3.5665,  # k=16 5-bit T row
    ("mod_pow", 17): 6.2824,
    ("mod_pow", 18): 13.601,
    ("mod_pow", 19): 23.828,
    ("pose_enc", 11): 0.13967,
    ("batch", 16): 3.7977,  # per-proof baseline: serial reference prover
    # verifying-time rows (benches/README.md:57,60,63,90)
    ("verify", 16): 0.0039912,
    ("verify", 17): 0.0034140,
    ("verify", 19): 0.0034429,
    ("verify", 11): 0.0029779,
}

# Exponent bit-size |T| per (workload, k), matching the BASELINE.md row the
# vs_baseline ratio compares against (the reference grows the circuit with
# k by widening the exponent, ~8K rows/bit — benches/README.md:52-82).  The
# k=16 rows keep T=5 (the baseline row is the *smaller* 3-bit/5-bit
# circuit, so the comparison is conservative).
T_BITS = {
    ("delay_enc", 16): 5,
    ("delay_enc", 17): 15,  # 7.4216 s row (130248 rows)
    ("delay_enc", 18): 31,  # 13.397 s row (257948 rows)
    ("delay_enc", 19): 32,  # 23.841 s row (265929 rows)
    ("mod_pow", 16): 5,
    ("mod_pow", 17): 8,  # 6.2824 s row
    ("mod_pow", 18): 31,  # 13.601 s row
    ("mod_pow", 19): 33,  # 23.828 s row
}

# Published sweep rows (workload, k, |T| or |msg|) -> proving seconds, for
# --t-bits / --msg runs off the default rows (benches/README.md:52-99).
SWEEP_BASELINES = {
    ("delay_enc", 16, 3): 3.7977, ("delay_enc", 16, 6): 4.1609,
    ("delay_enc", 17, 7): 6.8335, ("delay_enc", 17, 15): 7.4216,
    ("delay_enc", 18, 16): 12.524, ("delay_enc", 18, 31): 13.397,
    ("delay_enc", 19, 32): 23.841,
    ("mod_pow", 16, 4): 3.4051, ("mod_pow", 16, 5): 3.5665,
    ("mod_pow", 16, 6): 3.5869, ("mod_pow", 16, 7): 3.7930,
    ("mod_pow", 17, 8): 6.2824, ("mod_pow", 17, 15): 7.0485,
    ("mod_pow", 17, 16): 7.1383, ("mod_pow", 18, 17): 11.897,
    ("mod_pow", 18, 31): 13.601, ("mod_pow", 18, 32): 13.724,
    ("mod_pow", 19, 33): 23.828,
    ("pose_enc", 11, 1): 0.13862, ("pose_enc", 11, 2): 0.13967,
    ("pose_enc", 11, 3): 0.14139, ("pose_enc", 11, 4): 0.14836,
}


def build_circuit(workload: str, cfg, seed: int = 42, k: int | None = None,
                  t_bits: int | None = None, msg: int = 2):
    from delay_enc_tpu.fields import FR
    from delay_enc_tpu.poseidon import get_spec

    rng = np.random.default_rng(seed)
    cc = cfg.circuit
    spec = get_spec(FR, cc.t, cc.rate, cc.r_f, cc.r_p)

    def rand_bits(bits):
        # rejection-sample to exactly `bits` bits (stream-compatible with
        # earlier rounds' artifact caches for the byte-aligned n/x draws)
        v = 0
        while v.bit_length() != bits:
            nbytes = (bits + 7) // 8
            v = int.from_bytes(bytes(rng.integers(0, 256, nbytes, dtype="uint8")), "little")
            v &= (1 << bits) - 1
        return v

    if workload == "pose_enc":
        from delay_enc_tpu.encryption import PoseidonCipher
        from delay_enc_tpu.models import PoseidonEncCircuit

        key = (FR.random(rng), FR.random(rng))
        message = [0] * msg
        expected = PoseidonCipher(spec, key, capacity=msg).encrypt(message, 1)
        return PoseidonEncCircuit(
            spec=spec, num_input=msg, message=message, key=key,
            expected=expected, capacity=msg,
        ).build()
    if t_bits is None:
        t_bits = T_BITS.get((workload, k), cc.exp_limb_bits)
    n = rand_bits(cc.bits_len)
    if t_bits == cc.exp_limb_bits:
        # default window (lib.rs:124); draw kept stream/value-compatible
        # with earlier rounds so cached pk/vk artifacts stay valid
        e = int(rng.integers(1, 1 << t_bits))
    else:
        e = rand_bits(t_bits) | (1 << (t_bits - 1))  # |T|-bit, full ladder
    x = rand_bits(cc.bits_len) % n
    if workload == "mod_pow":
        from delay_enc_tpu.models import RSACircuit

        return RSACircuit(n=n, e=e, x=x, field=FR, exp_limb_bits=t_bits).build()
    from delay_enc_tpu.models import DelayEncryptCircuit

    return DelayEncryptCircuit(
        n=n, e=e, x=x, spec=spec, num_input=2, message=[0, 0], exp_limb_bits=t_bits
    ).build()


def get_keys(workload, builder, srs, k, cache_dir):
    """pk/vk with artifact caching, keyed by circuit shape + format version.
    Returns (pk, vk, key_path) — key_path names the on-disk artifacts so a
    later host-only `verify` run can reload the vk without keygen."""
    import hashlib

    from delay_enc_tpu.plonk import keygen
    from delay_enc_tpu.plonk.serialize import load_pk, save_pk

    t0 = time.time()
    h = hashlib.blake2b(digest_size=16)
    # v2: halo2-compatible point encodings/transcript (old caches invalid)
    h.update(f"v2:{workload}:{k}:{builder.rows}".encode())
    for name in ("q_a", "q_mul_ab", "q_constant", "tag_a"):
        h.update(str(builder.fixed[name][:2048]).encode())
    key_path = os.path.join(cache_dir, f"keys_{workload}_{h.hexdigest()}")
    if os.path.exists(key_path + ".pk.npz"):
        pk = load_pk(key_path)
        print(f"# keygen (cached) {time.time()-t0:.1f}s", file=sys.stderr)
        return pk, pk.vk, key_path
    from delay_enc_tpu.utils.timers import GLOBAL_METRICS

    GLOBAL_METRICS.spans.clear()
    pk, vk = keygen(builder, srs, k=k)
    if os.environ.get("DELAY_ENC_PROFILE"):
        for name, v in GLOBAL_METRICS.spans.items():
            print(f"#   {name}: {v:.2f}s", file=sys.stderr)
    try:
        save_pk(pk, key_path)
    except Exception as e:
        print(f"# pk cache save failed: {e}", file=sys.stderr)
    print(f"# keygen {time.time()-t0:.1f}s", file=sys.stderr)
    return pk, vk, key_path


def _save_proof_artifact(cache_dir, workload, k, key_path, proof: bytes,
                         srs_dir=None):
    """Persist a verified proof + its vk/srs pointers so `--workload verify`
    can bank a host-only metric in later runs (reference caches the proof
    the same way, benches/delay_enc.rs:117-144).  The SRS path rides in the
    meta because tau is sampled fresh per setup — a proof only verifies
    against the exact SRS that produced its keys."""
    try:
        base = os.path.join(cache_dir, f"proof_{workload}_k{k}")
        srs = os.path.join(srs_dir or cache_dir, f"srs_bn254_k{k}.npz")
        with open(base + ".bin", "wb") as f:
            f.write(proof)
        with open(base + ".json", "w") as f:
            json.dump({"vk": key_path + ".vk.npz", "proof": base + ".bin",
                       "srs": srs, "workload": workload, "k": k}, f)
        print(f"# proof artifact cached: {base}.bin", file=sys.stderr)
    except Exception as e:
        print(f"# proof cache save failed: {e}", file=sys.stderr)


def bench_verify(args, cfg):
    """Host-only verification of the cached proof artifact: no device, no
    compiles, no relay — the guaranteed-cheap metric the driver can always
    bank (reference verifying-time rows, benches/README.md:56-63)."""
    from delay_enc_tpu.plonk import SRS, verify_proof
    from delay_enc_tpu.plonk.serialize import load_vk

    cache_dir = cfg.prover.key_cache_dir or cfg.prover.srs_cache_dir
    # strongest artifact first: headline delay_enc k16, then any cached one
    candidates = [("delay_enc", args.k or 16)] + [
        (w, kk) for w in ("delay_enc", "mod_pow", "pose_enc")
        for kk in (19, 18, 17, 16, 11)
    ]
    meta_path = workload = k = None
    for w, kk in candidates:
        # bench_data_cpu holds a git-committed fallback artifact set (vk +
        # srs + proof) so this metric survives even a full machine wipe
        for d in (cache_dir, "bench_data_cpu"):
            p = os.path.join(d, f"proof_{w}_k{kk}.json")
            if os.path.exists(p):
                meta_path, workload, k = p, w, kk
                break
        if meta_path:
            break
    if meta_path is None:
        return {"metric": "delay_enc_k16_verify_s", "value": None,
                "unit": "s", "vs_baseline": None,
                "error": "no cached proof artifact"}
    with open(meta_path) as f:
        meta = json.load(f)
    with open(meta["proof"], "rb") as f:
        proof = f.read()
    vk = load_vk(meta["vk"])
    srs = SRS.load_host_meta(meta.get("srs") or os.path.join(
        cfg.prover.srs_cache_dir, f"srs_bn254_k{k}.npz"))
    assert verify_proof(srs, vk, proof), "cached proof failed to verify"
    reps = max(args.repeats, 25)  # min-of-N: more chances to dodge a
    # contention spike when background compiles share the host
    times = []
    for _ in range(reps):
        t0 = time.time()
        ok = verify_proof(srs, vk, proof)
        times.append(time.time() - t0)
        assert ok
    v = min(times)
    baseline = BASELINES.get(("verify", k))
    return {"metric": f"{workload}_k{k}_verify_s", "value": round(v, 6),
            "unit": "s",
            "vs_baseline": vs_baseline_ratio(baseline, v),
            "repeats": reps, "proof_bytes": len(proof)}


def _daemon_try(args, cfg, req: dict, result, metric_extra=None):
    """If a warm prover daemon is serving this workload, take the steady
    numbers from it (delay_enc_tpu/runtime/daemon.py): the daemon already
    paid the one-time executable-load tax, so the metric reflects the
    steady-state regime — the same one the reference's criterion bench
    measures.  The proof bytes are INDEPENDENTLY verified here (host-only
    vk + C verifier) before any metric is trusted.  Returns the final
    metric dict, or None to fall back to the inline path."""
    from delay_enc_tpu.runtime import daemon_request

    if os.environ.get("BENCH_NO_DAEMON"):
        return None  # forced inline path (e.g. a CPU fallback artifact run)
    st = daemon_request({"cmd": "ping"})
    if not st or not st.get("ok"):
        return None
    key = (f"batch:{req['k']}:{req['b']}" if req["cmd"] == "batch"
           else f"{req['workload']}:{req['k']}")
    # if the daemon is warming (or has queued) exactly this key, WAIT for
    # it rather than falling back to a cold inline start: the warm finishes
    # sooner than a fresh process could load its executables
    while (key not in st.get("warm", [])
           and (st.get("warming") == key or key in st.get("pending_warm", []))
           and _left(args) > 120):
        print(f"# daemon warming {key} — waiting ({_left(args):.0f}s left)",
              file=sys.stderr, flush=True)
        heartbeat()
        time.sleep(30)
        st = daemon_request({"cmd": "ping"})
        if not st or not st.get("ok"):
            return None
    if key not in st.get("warm", []):
        print(f"# daemon up but {key} not warm "
              f"(warm={st.get('warm')}, warming={st.get('warming')})",
              file=sys.stderr, flush=True)
        return None
    if st.get("warming") and not st.get("serves_while_warming"):
        # old single-thread daemon mid-warm: our job would queue behind a
        # possibly multi-hour foreign warm — run inline instead (the relay
        # serves multiple client processes concurrently, probe_device above)
        print(f"# daemon busy warming {st.get('warming')} and cannot serve "
              f"concurrently — falling back inline", file=sys.stderr, flush=True)
        return None
    print(f"# daemon serving {key} (uptime {st.get('uptime_s')}s)",
          file=sys.stderr, flush=True)
    extra = dict(metric_extra or {})

    def on_event(d):
        if d.get("event") != "repeat" or not d.get("seconds"):
            return
        if req["cmd"] == "batch":
            _emit({"metric": f"batch{req['b']}_delay_enc_k{req['k']}_proofs_per_s",
                   "value": d.get("proofs_per_s"), "unit": "proofs/s",
                   "vs_baseline": round(d["proofs_per_s"] *
                                        BASELINES[("batch", req["k"])], 3),
                   "repeats": d.get("i"), "warm_daemon": True})
        else:
            _emit(result(d["seconds"], repeats=d.get("i"),
                         phases_s=d.get("phases_s"), warm_daemon=True, **extra))

    budget = max(60.0, _left(args) - 30.0)
    req = dict(req, budget_s=round(budget, 1))
    fin = daemon_request(req, on_event=on_event, timeout=budget)
    if not fin or fin.get("event") != "done" or not fin.get("verified"):
        print(f"# daemon result unusable: {fin!r}", file=sys.stderr, flush=True)
        return None
    # trust, then verify: check the returned proof with the host-only path
    try:
        from delay_enc_tpu.plonk import SRS
        from delay_enc_tpu.plonk import verify_proof as _vp
        from delay_enc_tpu.plonk.serialize import load_vk

        vk = load_vk(fin["vk_path"] + ".vk.npz")
        srs_meta = SRS.load_host_meta(os.path.join(
            cfg.prover.srs_cache_dir, f"srs_bn254_k{req['k']}.npz"))
        proof = bytes.fromhex(fin["proof_hex"])
        if not _vp(srs_meta, vk, proof):
            print("# daemon proof FAILED client-side verification",
                  file=sys.stderr, flush=True)
            return None
        print(f"# daemon proof verified client-side ({len(proof)}B)",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# daemon proof client-side verify unavailable: {e!r}",
              file=sys.stderr, flush=True)
        return None
    if req["cmd"] == "batch":
        return {"metric": f"batch{fin['b']}_delay_enc_k{req['k']}_proofs_per_s",
                "value": fin["proofs_per_s"], "unit": "proofs/s",
                "vs_baseline": round(
                    fin["proofs_per_s"] * BASELINES[("batch", req["k"])], 3),
                "repeats": fin.get("repeats"), "warm_daemon": True,
                "verified": True, "warmup_s": fin.get("warmup_s")}
    return result(fin["best_s"], repeats=fin.get("repeats"), warm_daemon=True,
                  verified=True, warmup_s=fin.get("warmup_s"),
                  proof_bytes=len(proof), **extra)


def bench_prove(args, cfg):
    from delay_enc_tpu.plonk import SRS, create_proof, verify_proof
    from delay_enc_tpu.plonk.keygen import min_k
    from delay_enc_tpu.utils.timers import GLOBAL_METRICS

    t0 = time.time()
    k_target = args.k or cfg.prover.k  # may widen the circuit (T_BITS)
    builder = build_circuit(args.workload, cfg, k=k_target,
                            t_bits=args.t_bits, msg=args.msg)
    build_s = time.time() - t0
    k = k_target or max(
        min_k(builder), {"pose_enc": 11, "mod_pow": 16, "delay_enc": 16}[args.workload]
    )
    assert min_k(builder) <= k, f"circuit needs k>={min_k(builder)}, got {k}"
    print(f"# {args.workload}: rows={builder.rows} k={k} build={build_s:.2f}s "
          f"budget={args.budget:.0f}s", file=sys.stderr, flush=True)
    # sweep runs (--t-bits / --msg off the default row) get their own metric
    # name and the matching published baseline row when one exists
    suffix = ""
    if args.t_bits is not None and args.workload in ("delay_enc", "mod_pow"):
        suffix = f"_t{args.t_bits}"
        baseline = SWEEP_BASELINES.get((args.workload, k, args.t_bits))
    elif args.workload == "pose_enc" and args.msg != 2:
        suffix = f"_msg{args.msg}"
        baseline = SWEEP_BASELINES.get((args.workload, k, args.msg))
    else:
        baseline = BASELINES.get((args.workload, k))

    def result(prove_s, **extra):
        out = {
            "metric": f"{args.workload}_k{k}{suffix}_prove_s",
            "value": round(prove_s, 4),
            "unit": "s",
            "vs_baseline": vs_baseline_ratio(baseline, prove_s),
        }
        out.update(extra)
        return out

    if not suffix:  # daemon warms the default rows only
        res = _daemon_try(args, cfg,
                          {"cmd": "prove", "workload": args.workload, "k": k,
                           "repeats": max(args.repeats, 2)}, result)
        if res is not None:
            return res
        # daemon path failed (timeout/contention).  If a warm campaign is
        # in flight, the inline fallback is strictly WORSE: it pays 20-40
        # min of executable loads through the SAME contended relay the
        # warm needs (round-5 drive: a warm pose_enc prove stalled >5 min
        # under a k=16 warmup-compile).  Bail with a null metric — the
        # heartbeat keeps re-emitting the strongest banked line.
        try:
            from delay_enc_tpu.runtime import daemon_request

            st = daemon_request({"cmd": "ping"}) or {}
        except Exception:
            st = {}
        if (st.get("ok") and st.get("warming")
                and not os.environ.get("BENCH_NO_DAEMON")):
            print(f"# daemon mid-warm ({st.get('warming')}) — skipping the "
                  f"inline cold start (relay contention)",
                  file=sys.stderr, flush=True)
            return result(0.0) | {"value": None, "vs_baseline": None,
                                  "skipped": "daemon mid-warm"}

    t0 = time.time()
    srs = SRS.setup(k, cache_dir=cfg.prover.srs_cache_dir)
    print(f"# srs setup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    key_cache = cfg.prover.key_cache_dir or cfg.prover.srs_cache_dir
    pk, vk, key_path = get_keys(args.workload, builder, srs, k, key_cache)

    # warm-up (compiles cached after the first proof).  If the budget dies
    # during the repeats, the warmup-inclusive number below is already out.
    t0 = time.time()
    GLOBAL_METRICS.spans.clear()
    proof = create_proof(srs, pk, builder, np.random.default_rng(0))
    warmup_s = time.time() - t0
    print(f"# prove warmup {warmup_s:.1f}s", file=sys.stderr, flush=True)
    phases = {name: round(v, 4) for name, v in GLOBAL_METRICS.spans.items()}
    _emit(result(warmup_s, warmup_inclusive=True, phases_s=phases))

    times = []
    for i in range(args.repeats):
        need = 1.5 * (times[-1] if times else warmup_s / 4) + 30
        if times and _left(args) < need:
            print(f"# budget: stopping after {i} repeats", file=sys.stderr, flush=True)
            break
        GLOBAL_METRICS.spans.clear()
        t0 = time.time()
        proof = create_proof(srs, pk, builder, np.random.default_rng(i + 1))
        times.append(time.time() - t0)
        phases = {name: round(v, 4) for name, v in GLOBAL_METRICS.spans.items()}
        _emit(result(min(times), repeats=len(times), phases_s=phases))
    prove_s = min(times) if times else warmup_s

    verify_s = None
    ok = None
    if _left(args) > 20:
        t0 = time.time()
        ok = verify_proof(srs, vk, proof)
        verify_s = time.time() - t0
        assert ok, "proof failed to verify"
        print(f"# verify {verify_s:.2f}s ok; proof {len(proof)}B",
              file=sys.stderr, flush=True)
        if not suffix:  # only default rows feed the verify-workload cache
            _save_proof_artifact(key_cache, args.workload, k, key_path, proof)
    else:
        print("# budget: skipping verification", file=sys.stderr, flush=True)

    return result(
        prove_s,
        repeats=len(times),
        warmup_s=round(warmup_s, 4),
        verify_s=round(verify_s, 4) if verify_s is not None else None,
        verified=ok,
        proof_bytes=len(proof),
        phases_s=phases,
    )


def bench_batch(args, cfg):
    """B delay_enc proofs through the DP-batched pipeline (one leading
    instance axis through every device phase, plonk/batch_prover.py;
    BASELINE config 5).  --serial falls back to B sequential create_proof
    calls sharing one pk and warm kernels."""
    from delay_enc_tpu.plonk import SRS, create_proof, verify_proof
    from delay_enc_tpu.plonk.batch_prover import create_proofs_batched
    from delay_enc_tpu.plonk.keygen import min_k

    k_guess = args.k or cfg.prover.k or 16
    # default B: the batched quotient holds B instances' extended stacks
    # live (~0.7 GB each at k=16) — 4 fits a 16 GB chip comfortably
    B = args.batch or (4 if k_guess >= 16 else 8)
    builders = [build_circuit("delay_enc", cfg, seed=100 + i) for i in range(B)]
    k = args.k or cfg.prover.k or max(min_k(builders[0]), 16)
    if not args.serial:
        res = _daemon_try(args, cfg, {"cmd": "batch", "k": k, "b": B,
                                      "repeats": max(args.repeats, 2)},
                          result=None)
        if res is not None:
            return res
    srs = SRS.setup(k, cache_dir=cfg.prover.srs_cache_dir)
    pk, vk, _ = get_keys("delay_enc", builders[0], srs, k,
                         cfg.prover.key_cache_dir or cfg.prover.srs_cache_dir)
    baseline = BASELINES.get(("batch", k))

    if not args.serial:
        # warm-up (compile the batched shapes), then timed batched runs
        t0 = time.time()
        proofs = create_proofs_batched(srs, pk, builders, np.random.default_rng(0))
        warm = time.time() - t0
        print(f"# batched warmup {warm:.1f}s", file=sys.stderr, flush=True)
        _emit({"metric": f"batch{B}_delay_enc_k{k}_proofs_per_s",
               "value": round(B / warm, 4), "unit": "proofs/s",
               "vs_baseline": vs_baseline_ratio(baseline, warm / B if B else 0),
               "per_proof_s": round(warm / B, 4), "warmup_inclusive": True})
        t0 = time.time()
        proofs = create_proofs_batched(srs, pk, builders, np.random.default_rng(1))
        total_s = time.time() - t0
        assert all(verify_proof(srs, vk, p) for p in proofs), "batch proof failed"
        per_proof = total_s / B
        return {"metric": f"batch{B}_delay_enc_k{k}_proofs_per_s",
                "value": round(B / total_s, 4), "unit": "proofs/s",
                "vs_baseline": vs_baseline_ratio(baseline, per_proof),
                "per_proof_s": round(per_proof, 4), "proofs": B}

    # serial-instance mode with 2-deep pipeline overlap (PP analog,
    # plonk/pipeline.py): instance i's host phases run while instance
    # i+1's device phases dispatch
    from delay_enc_tpu.plonk.pipeline import create_proofs_pipelined

    # warm-up on instance 0
    t0 = time.time()
    create_proof(srs, pk, builders[0], np.random.default_rng(0))
    print(f"# prove warmup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    def result(done, total_s):
        per_proof = total_s / done
        return {
            "metric": f"batch{B}_delay_enc_k{k}_proofs_per_s",
            "value": round(done / total_s, 4),
            "unit": "proofs/s",
            "vs_baseline": vs_baseline_ratio(baseline, per_proof),
            "per_proof_s": round(per_proof, 4),
            "proofs": done,
        }

    t0 = time.time()
    proofs = create_proofs_pipelined(
        srs, pk, builders, seeds=list(range(1, B + 1)), depth=2,
        on_proof=lambda i, p: _emit(result(i + 1, time.time() - t0)),
    )
    total_s = time.time() - t0
    assert all(verify_proof(srs, vk, p) for p in proofs), "batch proof failed"
    return result(len(proofs), total_s)


def bench_msm(args, cfg):
    """Standalone MSM sweep (BASELINE config 4): points/s over the SRS."""
    import jax

    from delay_enc_tpu.fields import FR
    from delay_enc_tpu.ops import msm as M
    from delay_enc_tpu.plonk import SRS

    # above CHUNK_K the full per-SRS pair tables exceed HBM (12.9 GB at
    # 2^24), so the MSM runs in 2^CHUNK_K-point chunks with tables built
    # per chunk inside the timed region (one-shot MSM cost model; the
    # prover's amortized-table regime is the k <= CHUNK_K rows)
    CHUNK_K = 20
    k_max = args.k or 20
    srs = SRS.setup(k_max, cache_dir=cfg.prover.srs_cache_dir)
    rng = np.random.default_rng(0)
    sweep = {}
    for k in range(16, k_max + 1, 2):
        if sweep and _left(args) < 120:
            print("# budget: stopping msm sweep", file=sys.stderr, flush=True)
            break
        n = 1 << k
        if k <= CHUNK_K:
            sub = srs.truncated(k)
            tables = sub.pair_tables()
            scalars = M.scalars_to_limbs([FR.random(rng) for _ in range(n)])[None]
            # warm-up + compile (result is host affine — implicit full sync)
            M.msm_with_tables(tables, scalars)
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                res = M.msm_with_tables(tables, scalars)
            dt = (time.time() - t0) / reps
            sweep[f"2^{k}"] = {"s": round(dt, 4), "points_per_s": round(n / dt)}
        else:
            from delay_enc_tpu.curves.bn254 import G1

            CH = 1 << CHUNK_K
            scalars = M.scalars_to_limbs([FR.random(rng) for _ in range(n)])[None]
            # compile warm-up on the first chunk
            tab0 = M._jit_pair_tables(srs.g1_powers[:CH])
            M.msm_with_tables(tab0, scalars[:, :CH])
            del tab0
            t0 = time.time()
            acc = None
            for off in range(0, n, CH):
                tab = M._jit_pair_tables(srs.g1_powers[off : off + CH])
                (part,) = M.msm_with_tables(tab, scalars[:, off : off + CH])
                acc = G1.add(acc, part)
                del tab
            dt = time.time() - t0
            sweep[f"2^{k}"] = {"s": round(dt, 4), "points_per_s": round(n / dt),
                               "chunked_incl_table_build": True}
        print(f"# msm 2^{k}: {dt:.4f}s = {n/dt:,.0f} pts/s", file=sys.stderr, flush=True)
        peak = max(v["points_per_s"] for v in sweep.values())
        _emit({"metric": "msm_points_per_s_peak", "value": peak,
               "unit": "points/s", "vs_baseline": None, "sweep": sweep})
    peak = max(v["points_per_s"] for v in sweep.values())
    return {
        "metric": "msm_points_per_s_peak",
        "value": peak,
        "unit": "points/s",
        "vs_baseline": None,
        "sweep": sweep,
    }


def bench_ntt(args, cfg):
    """Standalone NTT sweep (BASELINE config 4)."""
    import jax
    import jax.numpy as jnp

    from delay_enc_tpu.fields import FR
    from delay_enc_tpu.ops import limbs as L
    from delay_enc_tpu.ops.ntt import NTTPlan, stockham

    rng = np.random.default_rng(0)
    sweep = {}
    k_max = args.k or 22
    f = jax.jit(lambda x, tws: stockham(L.FR_CTX, x, tws))
    for k in range(16, k_max + 1, 2):
        if sweep and _left(args) < 120:
            print("# budget: stopping ntt sweep", file=sys.stderr, flush=True)
            break
        n = 1 << k
        plan = NTTPlan.make(L.FR_CTX, k)
        a = jnp.asarray(L.FR_CTX.to_mont_np([FR.random(rng) for _ in range(n)]))
        r = f(a, plan.tw)
        np.asarray(jax.device_get(r[:1]))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            r = f(a, plan.tw)
        # force a device->host transfer: block_until_ready under-reports on
        # the axon transport (docs/PERF.md)
        np.asarray(jax.device_get(r[:1]))
        dt = (time.time() - t0) / reps
        sweep[f"2^{k}"] = round(dt, 5)
        print(f"# ntt 2^{k}: {dt*1000:.2f}ms", file=sys.stderr, flush=True)
        _emit({"metric": "ntt_2e20_s",
               "value": sweep.get("2^20", list(sweep.values())[-1]),
               "unit": "s", "vs_baseline": None, "sweep": sweep})
    return {
        "metric": "ntt_2e20_s",
        "value": sweep.get("2^20", list(sweep.values())[-1]),
        "unit": "s",
        "vs_baseline": None,
        "sweep": sweep,
    }


def _run_stage(tag, extra_args, deadline, env_extra=None, repeats=None):
    """Run one bench workload in a kill-able subprocess with a hard
    deadline, re-emitting every non-null JSON metric line it prints.
    Returns the child's last non-null metric dict (its best), or None.

    This is what makes the driver bench un-timeout-able: the warmup proof
    (un-interruptible in-process — it ate rounds 2 and 3) now lives in a
    child that dies at the deadline while the parent still exits 0 with
    whatever was banked."""
    remain = deadline - time.time()
    if remain < 45:
        print(f"# stage {tag}: skipped ({remain:.0f}s left)",
              file=sys.stderr, flush=True)
        return None
    cmd = [sys.executable, os.path.abspath(__file__)] + extra_args + [
        "--budget", f"{max(30.0, remain - 15.0):.0f}", "--no-probe"]
    if repeats is not None:
        cmd += ["--repeats", str(repeats)]
    env = dict(os.environ)
    if _BEST is not None:
        env["BENCH_BEST_JSON"] = json.dumps(_BEST)
    if env_extra:
        env.update(env_extra)
    print(f"# stage {tag}: start ({remain:.0f}s allotted)",
          file=sys.stderr, flush=True)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, env=env, text=True)
    lines: "queue.Queue[str | None]" = queue.Queue()

    def reader():
        try:
            for line in proc.stdout:
                lines.put(line)
        finally:
            lines.put(None)

    threading.Thread(target=reader, daemon=True).start()
    best = None
    while True:
        t = deadline - time.time()
        if t <= 0:
            break
        try:
            line = lines.get(timeout=min(t, 5.0))
        except queue.Empty:
            heartbeat()  # child silent (compiling/waiting) — keep the tail hot
            continue
        if line is None:
            break
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("value") is not None:
            d["stage"] = tag
            _emit(d)
            if not d.get("heartbeat"):  # a child heartbeat re-emitting the
                best = d                # seeded best is not THIS stage's result
    if proc.poll() is None:
        print(f"# stage {tag}: deadline reached — killing child",
              file=sys.stderr, flush=True)
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
    print(f"# stage {tag}: rc={proc.returncode} "
          f"best={(best or {}).get('value')}", file=sys.stderr, flush=True)
    return best


def bench_auto(args):
    """Driver mode (plain `python bench.py`): unconditional metric delivery.

    Order: placeholder line (instant) -> host-only verify metric (works
    with the relay down) -> device probe -> pose_enc k=11 (cheap, capped)
    -> delay_enc k=16 (the headline, rest of the budget).  The final line
    is the strongest banked metric; the process always exits 0 well before
    the budget."""
    placeholder = {"metric": "delay_enc_k16_prove_s", "value": None,
                   "unit": "s", "vs_baseline": None, "status": "starting"}
    _emit(placeholder)
    deadline = START_TIME + args.budget - 75.0

    res_verify = _run_stage(
        "verify", ["--workload", "verify"],
        min(deadline, time.time() + 180),
        env_extra={"JAX_PLATFORMS": "cpu"},
    )
    # a warm daemon IS a live device: skip the probe (which can time out
    # spuriously while background compiles saturate the relay tunnel)
    try:
        from delay_enc_tpu.runtime import daemon_request

        daemon_st = daemon_request({"cmd": "ping"}) or {}
    except Exception:
        daemon_st = {}
    daemon_live = bool(daemon_st.get("warm"))
    if daemon_live:
        print("# warm daemon detected — skipping device probe",
              file=sys.stderr, flush=True)

    res_pose = res_delay = None
    if daemon_live or probe_device(args):
        # headline delay_enc gets the FULL remaining budget: even fully
        # compile-cached, a fresh process pays ~10-20 min loading the big
        # cached executables through the relay before the first proof
        # (round-4 finding; in-process repeats then run ~8 s each).
        # EXCEPT when the daemon hasn't finished warming delay_enc yet
        # (warm campaigns take hours through a cold relay): then bank the
        # cheap pose_enc metric FIRST so a device-backed proof number is
        # guaranteed even if the delay_enc warm never lands in-budget.
        if "delay_enc:16" not in daemon_st.get("warm", []):
            print("# delay_enc:16 not warm — banking pose_enc first",
                  file=sys.stderr, flush=True)
            res_pose = _run_stage(
                "pose_enc", ["--workload", "pose_enc"],
                min(deadline, time.time() + 600),
            )
        res_delay = _run_stage(
            "delay_enc", ["--workload", "delay_enc"], deadline,
            repeats=args.repeats,
        )
        # batch throughput: only when the warm daemon serves it (a cold
        # batched-kernel compile would eat the whole remaining budget)
        res_batch = res_modpow = None
        try:
            from delay_enc_tpu.runtime import daemon_request

            st = daemon_request({"cmd": "ping"}) or {}
        except Exception:
            st = {}
        if "batch:16:4" in st.get("warm", []) and deadline - time.time() > 240:
            res_batch = _run_stage(
                "batch", ["--workload", "batch", "--batch", "4"], deadline,
            )
        # mod_pow (reference row k=17, 6.2824 s): only when the daemon
        # already holds it warm — a cold start would eat the headline budget
        for mp_key in ("mod_pow:17", "mod_pow:16"):
            if mp_key in st.get("warm", []) and deadline - time.time() > 240:
                res_modpow = _run_stage(
                    "mod_pow",
                    ["--workload", "mod_pow", "--k", mp_key.split(":")[1]],
                    deadline,
                )
                break
        if res_pose is None and deadline - time.time() > 400:
            res_pose = _run_stage(
                "pose_enc", ["--workload", "pose_enc"], deadline,
            )
    else:
        res_batch = res_modpow = None
        print("# device unavailable — emitting host-only result",
              file=sys.stderr, flush=True)

    final = dict(res_delay or res_batch or res_modpow or res_pose or res_verify
                 or {**placeholder, "status": "no-measurement"})
    final["banked"] = {
        tag: {"metric": r["metric"], "value": r["value"],
              "vs_baseline": r.get("vs_baseline")}
        for tag, r in (("verify", res_verify), ("pose_enc", res_pose),
                       ("batch", res_batch), ("mod_pow", res_modpow),
                       ("delay_enc", res_delay)) if r
    }
    return final


MANIFEST = "bench_data/jax_cache_manifest.json"


def check_cache_manifest(write: bool = False) -> None:
    """Compile-cache freshness report (VERDICT r3: kernel-shape churn
    silently invalidated `.jax_cache`, costing hours of TPU recompiles).
    A manifest (list of expected cache keys, committed after a successful
    warm campaign) lets every bench run say up front how much compile debt
    it is about to pay."""
    try:
        present = set(os.listdir(".jax_cache"))
    except OSError:
        present = set()
    if write:
        with open(MANIFEST, "w") as f:
            json.dump(sorted(present), f, indent=1)
        print(f"# cache manifest written: {len(present)} keys",
              file=sys.stderr, flush=True)
        return
    if not os.path.exists(MANIFEST):
        return
    with open(MANIFEST) as f:
        expected = set(json.load(f))
    missing = expected - present
    print(f"# jax_cache: {len(expected & present)}/{len(expected)} manifest "
          f"keys present ({len(missing)} missing -> fresh compiles ahead)",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="auto",
                    choices=["auto", "delay_enc", "mod_pow", "pose_enc",
                             "batch", "msm", "ntt", "verify"])
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--t-bits", type=int, default=None, dest="t_bits",
                    help="exponent bit-size |T| sweep for delay_enc/mod_pow "
                         "(default: the BASELINE.md row for k, T_BITS)")
    ap.add_argument("--msg", type=int, default=2,
                    help="message length |msg| sweep for pose_enc "
                         "(zero-valued, like the reference's tests)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--batch", type=int, default=None,
                    help="batch workload instance count (default: 4 at "
                         "k>=16, else 8)")
    ap.add_argument("--serial", action="store_true",
                    help="batch workload: B sequential proofs instead of the "
                         "DP-batched pipeline")
    ap.add_argument("--config", type=str, default=None,
                    help="JSON config file (delay_enc_tpu.utils.config.Config)")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 1750)),
                    help="wall-clock budget in seconds; optional phases are "
                         "skipped so a metric line is always emitted in time. "
                         "Default calibrated from the round-4 driver kill: "
                         "the external window closed while 239 s of a 2100 s "
                         "budget remained, so assume <=1860 s and keep margin")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the device probe (the parent auto-stage "
                         "already probed)")
    ap.add_argument("--write-cache-manifest", action="store_true",
                    help="record the current .jax_cache keys as the "
                         "expected-warm manifest and exit")
    args = ap.parse_args()

    if args.write_cache_manifest:
        check_cache_manifest(write=True)
        return
    _seed_best_from_env()
    check_cache_manifest()

    # honor JAX_PLATFORMS even when a sitecustomize forces a plugin platform
    # after env processing (jax.config.update beats it pre-backend-init)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if args.workload == "auto":
        try:
            out = bench_auto(args)
        except Exception as e:  # noqa: BLE001 — the final line must go out
            out = {"metric": "delay_enc_k16_prove_s", "value": None,
                   "unit": "s", "vs_baseline": None, "error": repr(e)}
        _emit(out)
        return

    if not args.no_probe and args.workload != "verify" and not probe_device(args):
        _emit({"metric": f"{args.workload}_unavailable", "value": None,
               "unit": "s", "vs_baseline": None,
               "error": "device backend unreachable (PJRT relay down?)"})
        sys.exit(1)

    import delay_enc_tpu  # noqa: F401
    from delay_enc_tpu.utils.config import Config

    cfg = Config.from_json(args.config) if args.config else Config.from_env()
    os.makedirs(cfg.prover.srs_cache_dir, exist_ok=True)

    if args.workload in ("delay_enc", "mod_pow", "pose_enc"):
        out = bench_prove(args, cfg)
    elif args.workload == "batch":
        out = bench_batch(args, cfg)
    elif args.workload == "msm":
        out = bench_msm(args, cfg)
    elif args.workload == "verify":
        out = bench_verify(args, cfg)
    else:
        out = bench_ntt(args, cfg)
    _emit(out)


if __name__ == "__main__":
    main()
