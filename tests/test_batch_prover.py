"""Data-parallel batched prover (plonk/batch_prover.py): B instances in one
batched pipeline; each resulting proof must verify independently and the
pipeline must run sharded over a mesh axis (DP, BASELINE config 5)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes of XLA:CPU compile

import jax

from delay_enc_tpu.cs import Builder, MainGate, RangeChip, Term
from delay_enc_tpu.fields import FR
from delay_enc_tpu.plonk import SRS, create_proof, keygen, verify_proof
from delay_enc_tpu.plonk.batch_prover import create_proofs_batched


@pytest.fixture(scope="module")
def srs():
    return SRS.setup(7, tau=987654321)


def _build_circuit(x0, y0):
    b = Builder(FR)
    mg = MainGate(b)
    rc = RangeChip(b)
    x = mg.assign_value(x0)
    y = mg.assign_value(y0)
    s = mg.add(x, y)
    m = mg.mul(x, y)
    acc = mg.compose([Term(x, 2), Term(y, 3), Term(s, 1), Term(m, 5)], constant=9)
    bit = mg.assign_bit(1)
    sel = mg.select(s, m, bit)
    mg.assert_equal(sel, s)
    rc.assign(45, 2, 6)
    mg.assert_one(mg.is_equal(acc, mg.assign_value(acc.value)))
    return b


def test_batched_proofs_verify(srs):
    builders = [_build_circuit(7, 11), _build_circuit(3, 5)]
    pk, vk = keygen(builders[0], srs)
    proofs = create_proofs_batched(srs, pk, builders, np.random.default_rng(1))
    assert len(proofs) == 2
    assert proofs[0] != proofs[1]
    for p in proofs:
        assert verify_proof(srs, vk, p)
    # cross-tamper: instance 0's proof with a byte from instance 1 fails
    bad = proofs[1][:40] + proofs[0][40:41] + proofs[1][41:]
    if bad != proofs[1]:
        assert not verify_proof(srs, vk, bad)


def test_batched_matches_single_prover_distribution(srs):
    """Same rng stream -> batched and single proofs both verify; the batch
    pipeline is an orchestration change, not a protocol change."""
    b = _build_circuit(2, 9)
    pk, vk = keygen(b, srs)
    single = create_proof(srs, pk, b, np.random.default_rng(3))
    (batched,) = create_proofs_batched(srs, pk, [b], np.random.default_rng(3))
    assert len(single) == len(batched)
    assert verify_proof(srs, vk, single) and verify_proof(srs, vk, batched)


def test_batched_sharded_over_mesh(srs):
    """B=8 instances sharded over the 8-device CPU mesh."""
    from delay_enc_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    builders = [_build_circuit(2 + i, 3 + i) for i in range(8)]
    pk, vk = keygen(builders[0], srs)
    proofs = create_proofs_batched(
        srs, pk, builders, np.random.default_rng(5), mesh=mesh, axis=mesh.axis_names[0]
    )
    for p in proofs:
        assert verify_proof(srs, vk, p)


def test_pipelined_proofs_verify(srs):
    """PP analog: depth-2 instance overlap produces valid, deterministic
    proofs identical to unpipelined ones with the same seeds."""
    from delay_enc_tpu.plonk.pipeline import create_proofs_pipelined

    builders = [_build_circuit(4, 9), _build_circuit(6, 13), _build_circuit(2, 3)]
    pk, vk = keygen(builders[0], srs)
    proofs = create_proofs_pipelined(srs, pk, builders, seeds=[11, 22, 33], depth=2)
    for p in proofs:
        assert verify_proof(srs, vk, p)
    # determinism vs the serial path (same per-instance rng seeds)
    serial = [create_proof(srs, pk, b, np.random.default_rng(s))
              for b, s in zip(builders, [11, 22, 33])]
    assert proofs == serial
