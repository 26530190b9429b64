"""Warm prover daemon protocol tests (delay_enc_tpu/runtime/daemon.py).

Uses the daemon's `stub` workload: the full socket protocol — warming
order, ping status, streamed repeat events, not-warm errors, shutdown —
without any device work, so the test runs in seconds on CPU.
"""

import os
import subprocess
import sys
import time

import pytest

from delay_enc_tpu.runtime import daemon_request


@pytest.fixture(scope="module")
def stub_daemon(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("daemon") / "d.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "delay_enc_tpu.runtime.daemon",
         "--warm", "stub", "--socket", sock],
        env=env, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 90
        st = None
        while time.time() < deadline:
            st = daemon_request({"cmd": "ping"}, socket_path=sock)
            if st and st.get("ok") and "stub:0" in st.get("warm", []):
                break
            time.sleep(0.5)
        assert st and "stub:0" in st.get("warm", []), f"daemon never warmed: {st}"
        yield sock
    finally:
        daemon_request({"cmd": "shutdown"}, socket_path=sock)
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_ping_status(stub_daemon):
    st = daemon_request({"cmd": "ping"}, socket_path=stub_daemon)
    assert st["ok"] and st["warm"] == ["stub:0"]
    assert st["queued"] == 0 and st["uptime_s"] >= 0


def test_prove_streams_events(stub_daemon):
    evs = []
    fin = daemon_request(
        {"cmd": "prove", "workload": "stub", "k": 0, "repeats": 3,
         "budget_s": 30},
        on_event=evs.append, timeout=30, socket_path=stub_daemon)
    assert fin["event"] == "done" and fin["repeats"] == 3
    assert [e["i"] for e in evs] == [1, 2, 3]
    assert bytes.fromhex(fin["proof_hex"]) == b"stub"


def test_not_warm_is_error_with_status(stub_daemon):
    fin = daemon_request({"cmd": "prove", "workload": "delay_enc", "k": 16},
                         socket_path=stub_daemon)
    assert fin["event"] == "error" and "not warm" in fin["error"]
    assert fin["warm"] == ["stub:0"]  # status piggybacked for the client log


def test_unknown_cmd(stub_daemon):
    fin = daemon_request({"cmd": "nonsense"}, socket_path=stub_daemon)
    assert fin["event"] == "error"


def test_absent_daemon_returns_none(tmp_path):
    assert daemon_request({"cmd": "ping"},
                          socket_path=str(tmp_path / "nope.sock")) is None


def test_set_warm_replaces_pending(stub_daemon):
    st = daemon_request({"cmd": "set_warm", "warm": "stub:0"},
                        socket_path=stub_daemon)
    assert st["ok"] and st["pending_warm"] == []  # stub:0 already warm
    st = daemon_request({"cmd": "ping"}, socket_path=stub_daemon)
    assert st["warm"] == ["stub:0"]


def test_setenv_flips_tuning_flags_only(stub_daemon):
    # DELAY_ENC_* keys apply; anything else is silently ignored (the daemon
    # must not let a client rewrite arbitrary process environment)
    st = daemon_request(
        {"cmd": "setenv", "env": {"DELAY_ENC_MSM": "b16", "HOME": "/pwned"}},
        socket_path=stub_daemon)
    assert st["ok"] and st["applied"] == {"DELAY_ENC_MSM": "b16"}
    # null clears the key
    st = daemon_request({"cmd": "setenv", "env": {"DELAY_ENC_MSM": None}},
                        socket_path=stub_daemon)
    assert st["applied"] == {"DELAY_ENC_MSM": None}


def test_serves_warm_key_while_warming(tmp_path):
    """A prove for an already-warm key must NOT queue behind an in-flight
    warm (the round-4 driver starvation: a multi-hour delay_enc:16 warm
    blocked the cheap warm pose_enc request on the old single-thread loop).
    stub:1 warms slowly (DELAY_ENC_STUB_WARM_S); stub:0 must serve during."""
    sock = str(tmp_path / "d.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu", DELAY_ENC_STUB_WARM_S="25")
    proc = subprocess.Popen(
        [sys.executable, "-m", "delay_enc_tpu.runtime.daemon",
         "--warm", "stub:0,stub:1", "--socket", sock],
        env=env, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 90
        st = None
        while time.time() < deadline:
            st = daemon_request({"cmd": "ping"}, socket_path=sock)
            if st and "stub:0" in st.get("warm", []):
                break
            time.sleep(0.2)
        assert st and "stub:0" in st.get("warm", [])
        assert st.get("serves_while_warming") is True
        # stub:1's slow warm is now in flight on the main thread
        assert st.get("warming") == "stub:1" or "stub:1" in st.get("pending_warm", [])
        t0 = time.time()
        fin = daemon_request(
            {"cmd": "prove", "workload": "stub", "k": 0, "repeats": 1,
             "budget_s": 10}, timeout=15, socket_path=sock)
        dt = time.time() - t0
        assert fin and fin.get("event") == "done", f"prove failed: {fin}"
        assert dt < 15, f"prove starved behind the warm ({dt:.1f}s)"
    finally:
        daemon_request({"cmd": "shutdown"}, socket_path=sock)
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_warmup_selfcheck_env_auto_on(monkeypatch):
    """The daemon's warmup proof must run with DELAY_ENC_SELFCHECK=1
    automatically (round-4 lesson: hardware-validate each batched kernel
    at its production shape on the first post-compile proof), dropping it
    afterwards; an explicit setting — including '0' — wins."""
    import os

    from delay_enc_tpu.runtime.daemon import _warmup_selfcheck_env

    monkeypatch.delenv("DELAY_ENC_SELFCHECK", raising=False)
    with _warmup_selfcheck_env():
        assert os.environ["DELAY_ENC_SELFCHECK"] == "1"
    assert "DELAY_ENC_SELFCHECK" not in os.environ

    monkeypatch.setenv("DELAY_ENC_SELFCHECK", "0")
    with _warmup_selfcheck_env():
        assert os.environ["DELAY_ENC_SELFCHECK"] == "0"
    assert os.environ["DELAY_ENC_SELFCHECK"] == "0"


def test_warm_one_runs_selfcheck_wiring(monkeypatch):
    """_warm_one wraps its warmup create_proof in the selfcheck env: the
    prover sees DELAY_ENC_SELFCHECK=1 during the warmup proof."""
    import os

    import numpy as np

    from delay_enc_tpu.runtime import daemon as D

    seen = {}

    class _Cfg:
        class prover:
            key_cache_dir = ""
            srs_cache_dir = "bench_data"

    monkeypatch.delenv("DELAY_ENC_SELFCHECK", raising=False)
    monkeypatch.setattr(
        "delay_enc_tpu.utils.config.Config.from_env", staticmethod(lambda: _Cfg))

    class _B:
        instance = []

    import bench

    monkeypatch.setattr(bench, "build_circuit",
                        lambda wl, cfg, seed=42, k=None: _B())
    monkeypatch.setattr(bench, "get_keys",
                        lambda wl, b, srs, k, cache: ("pk", "vk", "kp"))
    monkeypatch.setattr(bench, "_save_proof_artifact",
                        lambda *a, **kw: None)
    import delay_enc_tpu.plonk as P

    monkeypatch.setattr(P.SRS, "setup", staticmethod(lambda k, cache_dir=None: "srs"))

    def fake_create_proof(srs, pk, builder, rng):
        seen["selfcheck"] = os.environ.get("DELAY_ENC_SELFCHECK")
        return b"proof"

    monkeypatch.setattr(P, "create_proof", fake_create_proof)
    monkeypatch.setattr(P, "verify_proof", lambda *a, **kw: True)
    e = D.WarmEntry("pose_enc", 11)
    D.Daemon([], socket_path="/tmp/unused.sock")._warm_one(e)
    assert seen["selfcheck"] == "1"
    assert "DELAY_ENC_SELFCHECK" not in os.environ
