"""Warm prover daemon: a long-lived process that keeps the proving stack
resident — loaded device executables, MSM tables, SRS and proving keys —
and serves proof requests over a unix socket.

Why this exists: the production serving shape for a proving service is one
cold start amortized over many requests.  On this machine the effect is
extreme — the PJRT relay ships every cached executable (~0.9 GB for the
k=16 pipeline) at tunnel bandwidth, so a *fresh process* pays 20-40 min
before its first proof even with a complete compile cache, while in-process
proofs then run at steady state (~8 s at k=16).  The reference's own
benchmark regime is the warm one: criterion times a warmed in-process
prover (reference benches/delay_enc.rs:121-133), never a fresh-process
cold start.  bench.py reports daemon-served numbers with
`"warm_daemon": true` so the regime is explicit.

Run:  python -m delay_enc_tpu.runtime.daemon \
          --warm delay_enc:16,batch:16:4,pose_enc:11 [--socket PATH]

Protocol (newline-delimited JSON; see runtime/client.py):
  {"cmd":"ping"} -> {"ok":true,"warm":[...],"warming":...,"busy":...}
  {"cmd":"prove","workload":"delay_enc","k":16,"repeats":3,"budget_s":600}
      -> {"event":"repeat","i":1,"seconds":8.4,"phases_s":{...}} ...
      -> {"event":"done","best_s":...,"repeats":N,"proof_hex":...,
          "vk_path":...,"verified":true}
  {"cmd":"batch","k":16,"b":4,"repeats":2,"budget_s":600}
      -> {"event":"repeat","i":1,"seconds":S,"proofs_per_s":...} ...
      -> {"event":"done","best_s":...,"proofs_per_s":...,"verified":true}
  {"cmd":"shutdown"} -> {"event":"done"}
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import queue
import socket
import sys
import threading
import time


def _log(msg: str) -> None:
    print(f"# daemon {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


@contextlib.contextmanager
def _warmup_selfcheck_env():
    """The FIRST proof after a compile (the warmup) runs with the
    host-oracle selfcheck ON automatically (plonk/selfcheck.py): the
    round-4 k=16 miscompile was shape-dependent and invisible to the CPU
    suite — catching it costs one slow warmup proof instead of weeks of
    chip-time bisection.  Subsequent served proofs drop it.  An explicit
    DELAY_ENC_SELFCHECK (including '0') wins."""
    if "DELAY_ENC_SELFCHECK" in os.environ:
        yield
        return
    os.environ["DELAY_ENC_SELFCHECK"] = "1"
    try:
        yield
    finally:
        os.environ.pop("DELAY_ENC_SELFCHECK", None)


class WarmEntry:
    def __init__(self, workload: str, k: int, b: int | None = None):
        self.workload, self.k, self.b = workload, k, b
        self.builders = None  # [Builder] (b of them for batch)
        self.srs = self.pk = self.vk = None
        self.key_path = ""
        self.warmup_s = None
        self.seed = 1000  # per-request rng seeds advance from here

    @property
    def key(self) -> str:
        return (f"batch:{self.k}:{self.b}" if self.workload == "batch"
                else f"{self.workload}:{self.k}")


def _parse_warm(spec: str) -> list[WarmEntry]:
    out = []
    for part in filter(None, (s.strip() for s in spec.split(","))):
        bits = part.split(":")
        if bits[0] == "batch":
            out.append(WarmEntry("batch", int(bits[1]),
                                 int(bits[2]) if len(bits) > 2 else 4))
        elif bits[0] == "stub":  # protocol tests: no device, instant "proof"
            out.append(WarmEntry("stub", int(bits[1]) if len(bits) > 1 else 0))
        else:
            out.append(WarmEntry(bits[0], int(bits[1])))
    return out


class Daemon:
    def __init__(self, warm_specs: list[WarmEntry], socket_path: str):
        self.entries: dict[str, WarmEntry] = {e.key: e for e in warm_specs}
        self.pending = [e.key for e in warm_specs]
        self.socket_path = socket_path
        self.state_lock = threading.Lock()
        self.warm: list[str] = []
        self.warming: str | None = None
        self.busy: str | None = None
        self.jobs: "queue.Queue[tuple[socket.socket, dict]]" = queue.Queue()
        self.t0 = time.time()
        self._stop = False

    # ------------------------------------------------------------ server
    def _status(self) -> dict:
        with self.state_lock:
            return {"ok": True, "warm": list(self.warm), "warming": self.warming,
                    "pending_warm": list(self.pending), "busy": self.busy,
                    "uptime_s": round(time.time() - self.t0, 1),
                    "queued": self.jobs.qsize(),
                    # jobs for already-warm keys run on a dedicated thread,
                    # so a multi-hour warm never starves them (clients check
                    # this before queueing against an old single-thread
                    # daemon, runtime/client.py)
                    "serves_while_warming": True}

    def _serve_thread(self):
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            os.unlink(self.socket_path)
        except OSError:
            pass
        srv.bind(self.socket_path)
        srv.listen(16)
        srv.settimeout(1.0)
        _log(f"listening on {self.socket_path}")
        while not self._stop:
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=self._handle_conn, args=(conn,),
                             daemon=True).start()
        srv.close()

    def _handle_conn(self, conn: socket.socket):
        try:
            conn.settimeout(30.0)
            buf = b""
            while b"\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    conn.close()
                    return
                buf += chunk
            req = json.loads(buf.split(b"\n", 1)[0].decode())
        except (OSError, json.JSONDecodeError):
            conn.close()
            return
        if req.get("cmd") == "ping":
            _send(conn, self._status())
            conn.close()
            return
        if req.get("cmd") == "set_warm":
            # replace the PENDING warm list (the in-flight entry finishes;
            # use this to stop a long warm queue from blocking requests)
            new = _parse_warm(req.get("warm", ""))
            with self.state_lock:
                for e in new:
                    self.entries.setdefault(e.key, e)
                self.pending[:] = [e.key for e in new
                                   if e.key not in self.warm]
            _send(conn, self._status())
            conn.close()
            return
        if req.get("cmd") == "setenv":
            # flip framework tuning flags (DELAY_ENC_*) in-process: kernel
            # variant choices (e.g. DELAY_ENC_MSM=b16) are read from the
            # environment per commit call, so later proofs take the new
            # path while every already-loaded executable stays resident —
            # a fresh process would pay the 20-40 min relay reload instead
            env = req.get("env", {})
            applied = {}
            for k, v in env.items():
                if not str(k).startswith("DELAY_ENC"):
                    continue
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = str(v)
                applied[k] = v
            _log(f"setenv {applied}")
            st = self._status()
            st["applied"] = applied
            _send(conn, st)
            conn.close()
            return
        # streaming commands execute on the main (jax) thread
        self.jobs.put((conn, req))

    # ------------------------------------------------------------ warming
    def _warm_one(self, e: WarmEntry) -> None:
        t0 = time.time()
        if e.workload == "stub":
            # protocol tests: optional simulated warm duration so the
            # serve-while-warming path is testable without device work
            time.sleep(float(os.environ.get("DELAY_ENC_STUB_WARM_S", 0)) if e.k else 0.0)
            e.warmup_s = time.time() - t0
            _log(f"warm {e.key}: stub ready")
            return
        import numpy as np

        import bench  # repo-root bench.py: circuit builders + key cache

        from ..plonk import SRS, create_proof, verify_proof
        from ..utils.config import Config

        cfg = Config.from_env()  # same default wiring as bench.py main()
        wl = "delay_enc" if e.workload == "batch" else e.workload
        if e.workload == "batch":
            # mirror bench_batch EXACTLY (seeds 100+i, no k to the builder)
            # so the pk/vk artifact cache key matches and keygen stays warm
            e.builders = [bench.build_circuit(wl, cfg, seed=100 + i)
                          for i in range(e.b)]
        else:
            # mirror bench_prove (default seed 42, k from the warm spec)
            e.builders = [bench.build_circuit(wl, cfg, k=e.k)]
        cache = cfg.prover.key_cache_dir or cfg.prover.srs_cache_dir
        e.srs = SRS.setup(e.k, cache_dir=cfg.prover.srs_cache_dir)
        e.pk, e.vk, e.key_path = bench.get_keys(wl, e.builders[0], e.srs, e.k, cache)
        _log(f"warm {e.key}: keys ready {time.time()-t0:.1f}s — warmup proof")
        if e.workload == "batch":
            from ..plonk.batch_prover import create_proofs_batched

            with _warmup_selfcheck_env():
                proofs = create_proofs_batched(e.srs, e.pk, e.builders,
                                               np.random.default_rng(0))
            ok = all(verify_proof(e.srs, e.vk, pf, instances=b.instance)
                     for pf, b in zip(proofs, e.builders))
        else:
            with _warmup_selfcheck_env():
                proof = create_proof(e.srs, e.pk, e.builders[0],
                                     np.random.default_rng(0))
            ok = verify_proof(e.srs, e.vk, proof,
                              instances=e.builders[0].instance)
            if ok:
                # bank the verified warmup proof as a bench artifact so the
                # host-only `--workload verify` fallback has bytes to check
                # even on a machine whose artifact cache was wiped
                bench._save_proof_artifact(cache, wl, e.k, e.key_path, proof)
            else:
                # keep serving (clients see verified=false per proof and
                # refuse the metric), but save the bytes for offline
                # analysis — a failing proof is evidence, not garbage
                path = f".round4/failed_proof_{e.key.replace(':', '_')}.bin"
                with open(path, "wb") as f:
                    f.write(proof)
                _log(f"warm {e.key}: WARMUP PROOF FAILED VERIFY — saved {path}")
        e.warmup_s = time.time() - t0
        _log(f"warm {e.key}: done in {e.warmup_s:.1f}s (verified={ok})")

    # ------------------------------------------------------------- jobs
    def _run_prove(self, conn, req, e: WarmEntry):
        import numpy as np

        from ..plonk import create_proof, verify_proof
        from ..utils.timers import GLOBAL_METRICS

        repeats = int(req.get("repeats", 2))
        budget = float(req.get("budget_s", 300.0))
        t_end = time.time() + budget
        times, proof = [], b""
        for i in range(max(1, repeats)):
            if times and time.time() + 1.5 * times[-1] + 10 > t_end:
                break
            if e.workload == "stub":
                time.sleep(0.01)
                times.append(0.01)
                proof = b"stub"
                _send(conn, {"event": "repeat", "i": i + 1, "seconds": 0.01})
                continue
            GLOBAL_METRICS.spans.clear()
            e.seed += 1
            seed = int(req["seed"]) if "seed" in req else e.seed
            t0 = time.time()
            proof = create_proof(e.srs, e.pk, e.builders[0],
                                 np.random.default_rng(seed))
            times.append(time.time() - t0)
            phases = {nm: round(v, 4) for nm, v in GLOBAL_METRICS.spans.items()}
            _send(conn, {"event": "repeat", "i": i + 1,
                         "seconds": round(times[-1], 4), "phases_s": phases})
        verified = None
        if e.workload != "stub":
            verified = bool(verify_proof(e.srs, e.vk, proof,
                                         instances=e.builders[0].instance))
        _send(conn, {"event": "done", "best_s": round(min(times), 4),
                     "repeats": len(times), "verified": verified,
                     "warmup_s": e.warmup_s, "vk_path": e.key_path,
                     "proof_hex": proof.hex()})

    def _run_batch(self, conn, req, e: WarmEntry):
        import numpy as np

        from ..plonk import verify_proof
        from ..plonk.batch_prover import create_proofs_batched

        repeats = int(req.get("repeats", 2))
        budget = float(req.get("budget_s", 300.0))
        t_end = time.time() + budget
        times, proofs = [], []
        for i in range(max(1, repeats)):
            if times and time.time() + 1.5 * times[-1] + 10 > t_end:
                break
            e.seed += 1
            t0 = time.time()
            proofs = create_proofs_batched(e.srs, e.pk, e.builders,
                                           np.random.default_rng(e.seed))
            times.append(time.time() - t0)
            _send(conn, {"event": "repeat", "i": i + 1,
                         "seconds": round(times[-1], 4),
                         "proofs_per_s": round(e.b / times[-1], 4)})
        verified = all(verify_proof(e.srs, e.vk, pf, instances=b.instance)
                       for pf, b in zip(proofs, e.builders))
        _send(conn, {"event": "done", "best_s": round(min(times), 4),
                     "repeats": len(times), "b": e.b,
                     "proofs_per_s": round(e.b / min(times), 4),
                     "verified": bool(verified), "warmup_s": e.warmup_s,
                     "vk_path": e.key_path,
                     "proof_hex": proofs[0].hex() if proofs else ""})

    def _run_job(self, conn, req):
        cmd = req.get("cmd")
        if cmd == "shutdown":
            _send(conn, {"event": "done"})
            conn.close()
            self._stop = True
            return
        if cmd == "prove":
            key = f"{req.get('workload', 'delay_enc')}:{int(req.get('k', 16))}"
        elif cmd == "batch":
            key = f"batch:{int(req.get('k', 16))}:{int(req.get('b', 4))}"
        else:
            _send(conn, {"event": "error", "error": f"unknown cmd {cmd!r}"})
            conn.close()
            return
        with self.state_lock:
            is_warm = key in self.warm
            if is_warm:
                self.busy = key
        if not is_warm:
            _send(conn, {"event": "error", "error": f"{key} not warm",
                         **self._status()})
            conn.close()
            return
        e = self.entries[key]
        env_overlay = req.get("env") or {}
        saved = {k: os.environ.get(k) for k in env_overlay}
        try:
            os.environ.update({k: str(v) for k, v in env_overlay.items()})
            if cmd == "batch":
                self._run_batch(conn, req, e)
            else:
                self._run_prove(conn, req, e)
        except BrokenPipeError:
            _log(f"client gone mid-{cmd} ({key})")
        except Exception as ex:  # report, stay alive
            _log(f"job {key} failed: {ex!r}")
            try:
                _send(conn, {"event": "error", "error": repr(ex)})
            except OSError:
                pass
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            with self.state_lock:
                self.busy = None
            try:
                conn.close()
            except OSError:
                pass

    # ------------------------------------------------------------- main
    def _job_thread(self):
        """Serve prove/batch jobs for already-warm keys concurrently with
        the warm campaign on the main thread.  JAX dispatch is thread-safe;
        a warm key's executables are already loaded, so its proofs execute
        while the warming key's fresh shapes compile through the relay —
        without this, a multi-hour k=16 warm starved even the cheap warm
        pose_enc request (round-4 finding: the driver banked nothing but
        the host-only verify metric)."""
        while not self._stop:
            try:
                conn, req = self.jobs.get(timeout=0.5)
            except queue.Empty:
                continue
            self._run_job(conn, req)

    def run(self):
        threading.Thread(target=self._serve_thread, daemon=True).start()
        threading.Thread(target=self._job_thread, daemon=True).start()
        while not self._stop:
            time.sleep(0.5)
            with self.state_lock:
                key = self.pending.pop(0) if self.pending else None
            if key is not None:
                with self.state_lock:
                    self.warming = key
                try:
                    self._warm_one(self.entries[key])
                    with self.state_lock:
                        self.warm.append(key)
                except Exception as ex:
                    _log(f"warm {key} FAILED: {ex!r}")
                finally:
                    with self.state_lock:
                        self.warming = None
        try:
            os.unlink(self.socket_path)
        except OSError:
            pass
        _log("stopped")


def _send(conn: socket.socket, obj: dict) -> None:
    conn.sendall((json.dumps(obj) + "\n").encode())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", default="delay_enc:16",
                    help="comma list: workload:k or batch:k:b, warmed in order")
    ap.add_argument("--socket", default=None)
    args = ap.parse_args(argv)
    # bench.py lives at the repo root (two levels above this package)
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    os.chdir(root)
    from .client import default_socket_path

    sock = args.socket or default_socket_path() or os.path.join(root, ".daemon.sock")
    Daemon(_parse_warm(args.warm), sock).run()


if __name__ == "__main__":
    main()
