"""Transcript + point-encoding format tests.

The transcript must implement the exact byte-level algorithm of halo2's
`Blake2bWrite<Challenge255<G1Affine>>` (PSE halo2_proofs v2023_04_20
src/transcript.rs; instantiated by the reference at
benches/delay_enc.rs:19-22).  Rust cannot run in this environment, so the
vectors below are hand-derived from the documented algorithm (personal
string, prefix bytes, clone-finalize squeezing, from_bytes_wide reduction)
with an independent inline hashlib construction — they lock the format so
any refactor that changes a single byte of the absorption order fails here.
"""

import hashlib

import pytest

from delay_enc_tpu.curves.bn254 import (
    G1,
    G1_GEN,
    g1_from_bytes,
    g1_to_bytes,
)
from delay_enc_tpu.fields.bn254 import FQ, FR
from delay_enc_tpu.plonk.transcript import Transcript

P = FQ.p


# ---------------------------------------------------------------- points

def test_g1_generator_encoding():
    # generator (1, 2): y even -> top bit clear -> bytes = LE(1)
    assert g1_to_bytes(G1_GEN) == (1).to_bytes(32, "little")
    # negation (1, p-2): y odd -> top bit set
    neg = G1.neg(G1_GEN)
    assert g1_to_bytes(neg) == (1 | (1 << 255)).to_bytes(32, "little")
    assert g1_from_bytes(g1_to_bytes(G1_GEN)) == G1_GEN
    assert g1_from_bytes(g1_to_bytes(neg)) == neg


def test_g1_identity_encoding():
    assert g1_to_bytes(None) == b"\x00" * 32
    assert g1_from_bytes(b"\x00" * 32) is None


def test_g1_rejects_noncanonical_x():
    # x' = x + p encodes the same point in a second way; must be rejected
    for xplus in (P, P + 1, (1 << 255) - 1):
        with pytest.raises(ValueError):
            g1_from_bytes(xplus.to_bytes(32, "little"))


def test_g1_rejects_off_curve():
    # x = 4: 4^3 + 3 = 67 must not be a QR (if it were, pick another); find
    # a small off-curve x deterministically
    x = next(x for x in range(2, 50) if FQ.sqrt((x**3 + 3) % P) is None)
    with pytest.raises(ValueError):
        g1_from_bytes(x.to_bytes(32, "little"))


def test_g1_roundtrip_random():
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(8):
        pt = G1.mul(G1_GEN, int(rng.integers(1, 1 << 60)))
        assert g1_from_bytes(g1_to_bytes(pt)) == pt


# ------------------------------------------------------------- transcript

def test_empty_squeeze_vector():
    """First challenge on an empty transcript == blake2b-512 with personal
    'Halo2-Transcript' over the single prefix byte 0x00, reduced mod r —
    computed here independently of the Transcript class."""
    expected_digest = hashlib.blake2b(
        b"\x00", digest_size=64, person=b"Halo2-Transcript"
    ).digest()
    expected = int.from_bytes(expected_digest, "little") % FR.p
    assert Transcript().challenge() == expected


def test_absorb_point_scalar_vector():
    """Absorption layout: 0x01 || x.repr || y.repr for points,
    0x02 || s.repr for scalars, each repr 32-byte canonical LE."""
    s = 123456789
    ref = hashlib.blake2b(digest_size=64, person=b"Halo2-Transcript")
    ref.update(b"\x01" + (1).to_bytes(32, "little") + (2).to_bytes(32, "little"))
    ref.update(b"\x02" + s.to_bytes(32, "little"))
    ref.update(b"\x00")
    expected = int.from_bytes(ref.digest(), "little") % FR.p

    tr = Transcript()
    tr.common_point(G1_GEN)
    tr.common_scalar(s)
    assert tr.challenge() == expected


def test_successive_squeezes_differ():
    tr = Transcript()
    c1 = tr.challenge()
    c2 = tr.challenge()
    # second squeeze = digest over [0x00, 0x00]
    ref = hashlib.blake2b(b"\x00\x00", digest_size=64, person=b"Halo2-Transcript")
    assert c2 == int.from_bytes(ref.digest(), "little") % FR.p
    assert c1 != c2


def test_squeeze_does_not_absorb_digest():
    """halo2 finalizes a *clone*: the running state after a squeeze has
    absorbed only the prefix byte, not the digest."""
    tr = Transcript()
    tr.challenge()
    tr.common_scalar(5)
    ref = hashlib.blake2b(digest_size=64, person=b"Halo2-Transcript")
    ref.update(b"\x00")  # squeeze prefix only
    ref.update(b"\x02" + (5).to_bytes(32, "little"))
    ref.update(b"\x00")
    assert tr.challenge() == int.from_bytes(ref.digest(), "little") % FR.p


def test_write_stream_is_compressed_points():
    tr = Transcript()
    tr.write_point(G1_GEN)
    tr.write_scalar(42)
    assert bytes(tr.data) == g1_to_bytes(G1_GEN) + (42).to_bytes(32, "little")


def test_identity_point_absorption():
    """Identity absorbs as 0x01 || 64 zero bytes (framework extension for
    degenerate zero-polynomial commitments; halo2 errors in that case)."""
    tr = Transcript()
    tr.common_point(None)
    ref = hashlib.blake2b(digest_size=64, person=b"Halo2-Transcript")
    ref.update(b"\x01" + b"\x00" * 64 + b"\x00")
    assert tr.challenge() == int.from_bytes(ref.digest(), "little") % FR.p


def test_parity_surface_pinned_override(tmp_path, monkeypatch):
    """The byte-parity residual vs the Rust reference is exactly ONE
    input: the pinned-vk string absorbed first into the transcript
    (halo2 keygen_vk, used at reference benches/delay_enc.rs:84-98).
    This locks (a) the downstream hashing scheme to a golden fixture —
    blake2b-512, person=b"Halo2-Verify-Key", u64-LE length prefix,
    from_bytes_wide reduction — and (b) the DELAY_ENC_VK_PINNED_FILE
    injection point that substitutes Rust's exact bytes when available."""
    from delay_enc_tpu.plonk.keygen import _pinned_override, transcript_repr

    fx = tmp_path / "pinned.txt"
    fx.write_bytes(b"PinnedVerificationKey { parity-surface-fixture }")
    monkeypatch.setenv("DELAY_ENC_VK_PINNED_FILE", str(fx))
    assert _pinned_override() == fx.read_bytes()
    # domain/commitments are ignored under the override, so None is fine —
    # the value is the golden constant for the fixture bytes
    golden = 0x25CCA57BC81D1175DBEC0799E3AB649166B6CBC14C583FAB9DDA92DC83065FCC
    assert transcript_repr(None, {}, []) == golden
    monkeypatch.delenv("DELAY_ENC_VK_PINNED_FILE")
    assert _pinned_override() is None
