"""End-to-end proof pipeline test on a small circuit: keygen -> create_proof
-> verify_proof (KZG/GWC with real pairings), plus tamper rejection.

Mirrors the role of the reference's bench pipeline (benches/delay_enc.rs:
setup -> keygen -> create_proof -> verify_proof) at a toy size."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes of XLA:CPU compile

from delay_enc_tpu.cs import Builder, MainGate, RangeChip, Term
from delay_enc_tpu.fields import FR
from delay_enc_tpu.plonk import SRS, create_proof, keygen, verify_proof


@pytest.fixture(scope="module")
def srs():
    return SRS.setup(7, tau=123456789)  # fixed tau: deterministic test SRS


def _build_circuit(x0=7, y0=11):
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
    rc.assign(45, 2, 6)  # range lookup path (table width 2)
    mg.assert_one(mg.is_equal(acc, mg.assign_value(acc.value)))
    return b


def test_prove_and_verify(srs):
    b = _build_circuit()
    pk, vk = keygen(b, srs)
    assert vk.domain.k <= 7
    rng = np.random.default_rng(42)
    proof = create_proof(srs, pk, b, rng)
    assert verify_proof(srs, vk, proof)


def test_proof_rejects_tampering(srs):
    b = _build_circuit()
    pk, vk = keygen(b, srs)
    proof = create_proof(srs, pk, b, np.random.default_rng(1))
    assert verify_proof(srs, vk, proof)
    # flip a byte in an eval region (scalar area near the end)
    bad = bytearray(proof)
    bad[-40] ^= 1
    assert not verify_proof(srs, vk, bytes(bad))


def test_bad_witness_proof_fails(srs):
    b = _build_circuit()
    pk, vk = keygen(b, srs)
    # tamper witness: break the add gate
    b2 = _build_circuit()
    b2.advice[2][2] = (b2.advice[2][2] + 1) % FR.p
    proof = create_proof(srs, pk, b2, np.random.default_rng(2))
    assert not verify_proof(srs, vk, proof)


def test_different_instances_same_vk(srs):
    # same structure, different witness -> still verifies under the same keys
    b1 = _build_circuit(7, 11)
    pk, vk = keygen(b1, srs)
    b2 = _build_circuit(13, 17)
    proof = create_proof(srs, pk, b2, np.random.default_rng(3))
    assert verify_proof(srs, vk, proof)


def test_public_inputs(srs):
    from delay_enc_tpu.cs import Builder, MainGate

    def build(x0, y0):
        b = Builder(FR)
        mg = MainGate(b)
        x = mg.assign_value(x0)
        y = mg.assign_value(y0)
        m = mg.mul(x, y)
        b.expose_public(m)  # product is a public input
        return b

    b = build(6, 7)
    pk, vk = keygen(b, srs)
    proof = create_proof(srs, pk, b, np.random.default_rng(5))
    assert verify_proof(srs, vk, proof, instances=[42])
    # wrong public input must fail
    assert not verify_proof(srs, vk, proof, instances=[43])
    # and a different instance proves under the same keys
    b2 = build(5, 8)
    proof2 = create_proof(srs, pk, b2, np.random.default_rng(6))
    assert verify_proof(srs, vk, proof2, instances=[40])


def test_split_quotient_matches_fused(srs):
    """Split-coset quotient mode (k >= 18 memory strategy, forced on here)
    must produce byte-identical proofs to the fused 8n path: the quotient
    polynomial is deterministic given witness + challenges, and the rng
    stream is consumed identically."""
    b = _build_circuit()
    pk_f, vk_f = keygen(b, srs, split=False)
    pk_s, vk_s = keygen(b, srs, split=True)
    assert pk_s.fixed_ext is None and pk_s.split
    assert vk_f.transcript_repr == vk_s.transcript_repr
    p_f = create_proof(srs, pk_f, b, np.random.default_rng(9))
    p_s = create_proof(srs, pk_s, b, np.random.default_rng(9))
    assert p_f == p_s
    assert verify_proof(srs, vk_s, p_s)


def test_batch_verification_accumulator(srs):
    """AccumulatorStrategy analog (reference benches/delay_enc.rs:153-165):
    many proofs fold into ONE pairing check; a single bad proof fails the
    whole batch; the empty batch is vacuously true; a tampered pairing-
    level proof (valid scalars, broken opening) is caught by the batch."""
    from delay_enc_tpu.plonk.verifier import verify_proofs_batched

    b = _build_circuit()
    pk, vk = keygen(b, srs)
    proofs = [create_proof(srs, pk, b, np.random.default_rng(10 + i))
              for i in range(3)]
    assert verify_proofs_batched(srs, vk, proofs)
    assert verify_proofs_batched(srs, vk, [])
    rng = np.random.default_rng(0)
    assert verify_proofs_batched(srs, vk, proofs, rng=rng)
    # corrupt ONLY the final opening points of proof 1 (the W_j): the
    # quotient identity still passes, so rejection must come from the
    # batched pairing itself — swap W bytes with another proof's
    other = create_proof(srs, pk, _build_circuit(3, 5),
                         np.random.default_rng(99))
    bad = proofs[0][: len(proofs[0]) - 3 * 32] + other[-3 * 32 :]
    assert not verify_proof(srs, vk, bad)
    assert not verify_proofs_batched(srs, vk, [proofs[1], bad, proofs[2]])
    # scalar-level tamper short-circuits before any pairing
    flip = bytearray(proofs[2])
    flip[200] ^= 1
    assert not verify_proofs_batched(srs, vk, [proofs[1], bytes(flip)])


def test_lookup_fvals_c_matches_python(monkeypatch):
    """The C lookup_fvals kernel (native/limbops.c) must be bit-identical
    to the Python compression formula path for random keys/theta."""
    import numpy as np

    from delay_enc_tpu.plonk import prover as PR

    rng = np.random.default_rng(3)
    keys = np.sort(rng.integers(0, 1 << 32, 500, dtype=np.uint32))
    keys[:7] = 0
    theta = int.from_bytes(bytes(rng.integers(0, 256, 32, dtype="uint8")),
                           "little") % PR.FR.p
    got = PR._fvals_mont(keys, theta)
    import delay_enc_tpu.native as N

    monkeypatch.setattr(N, "get_lib", lambda: None)
    want = PR._fvals_mont(keys, theta)
    assert got.dtype == np.uint32 and got.shape == (500, 16)
    assert (got == want).all()
