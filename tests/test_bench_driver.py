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
