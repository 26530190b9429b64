"""RSAChip tests: modpow positive/negative (impl_rsa_modpow_test_circuit!
analog, rsa/chip.rs:274-561) and PKCS#1 v1.5 signature verification against
a freshly generated real RSA-2048/SHA-256 vector (the reference pins
hard-coded vectors, rsa/chip.rs:686-819; we generate an equivalent one)."""

import hashlib

import numpy as np
import pytest

from delay_enc_tpu.cs import Builder
from delay_enc_tpu.cs.mock import mock_failures
from delay_enc_tpu.fields import FR
from delay_enc_tpu.gadgets.big_integer import big_pow_mod, decompose_big
from delay_enc_tpu.gadgets.rsa import (
    LIMB_WIDTH,
    RSAChip,
    RSAPublicKey,
    RSASignature,
    RSASignatureVerifier,
)

BITS = 1024  # keep mock runtimes reasonable; delay_enc tests cover 2048
NUM_LIMBS = BITS // LIMB_WIDTH


def _rand_odd(rng, bits):
    v = int.from_bytes(bytes(rng.integers(0, 256, bits // 8, dtype="uint8")), "little")
    return v | (1 << (bits - 1)) | 1


def _is_prime(n, rng, rounds=20):
    if n < 4:
        return n in (2, 3)
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for _ in range(rounds):
        a = int(rng.integers(2, 1 << 30))
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(rng, bits):
    while True:
        p = _rand_odd(rng, bits)
        if _is_prime(p, rng):
            return p


@pytest.fixture(scope="module")
def rsa_keypair():
    rng = np.random.default_rng(7)
    p = _gen_prime(rng, BITS // 2)
    q = _gen_prime(rng, BITS // 2)
    n = p * q
    e = 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    return n, e, d


def test_modpow_var_exponent():
    rng = np.random.default_rng(0)
    n = _rand_odd(rng, BITS)
    x = int.from_bytes(bytes(rng.integers(0, 256, BITS // 8, dtype="uint8")), "little") % n
    e = 0b10111
    b = Builder(FR)
    chip = RSAChip(b, BITS, 5)
    bic = chip.bigint_chip()
    pk = chip.assign_public_key(RSAPublicKey.var(n, e, NUM_LIMBS, 5))
    xa = bic.assign_integer(decompose_big(x, NUM_LIMBS, LIMB_WIDTH))
    powed = chip.modpow_public_key(xa, pk)
    expected = bic.assign_constant_fresh(big_pow_mod(x, e, n))
    bic.assert_equal_fresh(powed, expected)
    assert mock_failures(b) == []


def test_modpow_bad_result_detected():
    rng = np.random.default_rng(1)
    n = _rand_odd(rng, BITS)
    x = int.from_bytes(bytes(rng.integers(0, 256, BITS // 8, dtype="uint8")), "little") % n
    e = 0b00111
    b = Builder(FR)
    chip = RSAChip(b, BITS, 5)
    bic = chip.bigint_chip()
    pk = chip.assign_public_key(RSAPublicKey.var(n, e, NUM_LIMBS, 5))
    xa = bic.assign_integer(decompose_big(x, NUM_LIMBS, LIMB_WIDTH))
    powed = chip.modpow_public_key(xa, pk)
    wrong = bic.assign_constant_fresh((big_pow_mod(x, e, n) + 1) % n)
    bic.assert_equal_fresh(powed, wrong)
    assert mock_failures(b)


def _pkcs1v15_em(msg: bytes, k_bytes: int) -> tuple[bytes, bytes]:
    digest = hashlib.sha256(msg).digest()
    prefix = bytes.fromhex("3031300d060960864801650304020105000420")
    t = prefix + digest
    ps = b"\xff" * (k_bytes - len(t) - 3)
    return b"\x00\x01" + ps + b"\x00" + t, digest


@pytest.mark.parametrize("use_fix_e", [True, False])
def test_pkcs1v15_signature(rsa_keypair, use_fix_e):
    n, e, d = rsa_keypair
    msg = b"delay encryption on TPU"
    em, digest = _pkcs1v15_em(msg, BITS // 8)
    em_int = int.from_bytes(em, "big")
    sig = pow(em_int, d, n)
    assert pow(sig, e, n) == em_int

    b = Builder(FR)
    chip = RSAChip(b, BITS, 17 if not use_fix_e else 5)
    if use_fix_e:
        pk = chip.assign_public_key(RSAPublicKey.fix(n, e, NUM_LIMBS))
    else:
        pk = chip.assign_public_key(RSAPublicKey.var(n, e, NUM_LIMBS, 17))
    sig_a = chip.assign_signature(RSASignature.from_int(sig, NUM_LIMBS))
    verifier = RSASignatureVerifier(chip)
    is_valid, _ = verifier.verify_pkcs1v15_signature(pk, digest, sig_a)
    assert is_valid.value == 1
    chip.main_gate().assert_one(is_valid)
    assert mock_failures(b) == []


def test_pkcs1v15_bad_signature(rsa_keypair):
    n, e, d = rsa_keypair
    msg = b"delay encryption on TPU"
    em, digest = _pkcs1v15_em(msg, BITS // 8)
    sig = pow(int.from_bytes(em, "big"), d, n) ^ 1  # corrupt

    b = Builder(FR)
    chip = RSAChip(b, BITS, 5)
    pk = chip.assign_public_key(RSAPublicKey.fix(n, e, NUM_LIMBS))
    sig_a = chip.assign_signature(RSASignature.from_int(sig % n, NUM_LIMBS))
    verifier = RSASignatureVerifier(chip)
    is_valid, _ = verifier.verify_pkcs1v15_signature(pk, digest, sig_a)
    assert is_valid.value == 0
    assert mock_failures(b) == []  # circuit is satisfied; the bit reports invalid


def test_pkcs1v15_signature_instance_bound(rsa_keypair):
    """Instance-bound verification: n limbs + hash bytes exposed as public
    inputs, exactly like the reference's TestRSASignatureWithHashCircuit
    (rsa/mod.rs:456-474 exposes n limbs then hashed-msg bytes on the
    instance column).  Tampering any public slot must break the copy
    constraint."""
    n, e, d = rsa_keypair
    msg = b"instance-bound rsa on TPU"
    em, digest = _pkcs1v15_em(msg, BITS // 8)
    sig = pow(int.from_bytes(em, "big"), d, n)

    def build():
        b = Builder(FR)
        chip = RSAChip(b, BITS, 5)
        pk = chip.assign_public_key(RSAPublicKey.fix(n, e, NUM_LIMBS))
        sig_a = chip.assign_signature(RSASignature.from_int(sig, NUM_LIMBS))
        verifier = RSASignatureVerifier(chip)
        is_valid, byte_cells = verifier.verify_pkcs1v15_signature(pk, digest, sig_a)
        chip.main_gate().assert_one(is_valid)
        # expose n limbs, then hash bytes (reference ordering, mod.rs:380-386)
        for limb in pk.n.limbs:
            b.expose_public(limb)
        for cell in byte_cells:
            b.expose_public(cell)
        return b

    b = build()
    expected = decompose_big(n, NUM_LIMBS, LIMB_WIDTH) + list(digest)
    assert b.instance == expected
    assert mock_failures(b) == []

    # tamper an n limb
    b = build()
    b.instance[3] = (b.instance[3] + 1) % FR.p
    assert any(f.kind == "copy" for f in mock_failures(b))

    # tamper a hash byte
    b = build()
    b.instance[NUM_LIMBS + 5] = (b.instance[NUM_LIMBS + 5] + 1) % FR.p
    assert any(f.kind == "copy" for f in mock_failures(b))
