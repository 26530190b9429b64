import pytest

from delay_enc_tpu.curves.bn254 import G1, G2, G1_GEN, G2_GEN
from delay_enc_tpu.curves.pairing import pairing, pairing_check
from delay_enc_tpu.fields import FR
from delay_enc_tpu.fields.bn254 import Fq12


@pytest.fixture(scope="module")
def e_g1_g2():
    return pairing(G1_GEN, G2_GEN)


def test_pairing_nondegenerate(e_g1_g2):
    assert not e_g1_g2.is_one()
    # e lands in the order-r subgroup
    assert e_g1_g2.pow(FR.p).is_one()


def test_pairing_bilinear_left(e_g1_g2):
    a = 7
    lhs = pairing(G1.mul(G1_GEN, a), G2_GEN)
    assert lhs == e_g1_g2.pow(a)


def test_pairing_bilinear_right(e_g1_g2):
    b = 11
    rhs = pairing(G1_GEN, G2.mul(G2_GEN, b))
    assert rhs == e_g1_g2.pow(b)


def test_pairing_check_kzg_shape():
    # e(aP, Q) * e(-P, aQ) == 1
    a = 123456789
    pairs = [
        (G1.mul(G1_GEN, a), G2_GEN),
        (G1.neg(G1_GEN), G2.mul(G2_GEN, a)),
    ]
    assert pairing_check(pairs)
    # and a corrupted statement fails
    bad = [
        (G1.mul(G1_GEN, a + 1), G2_GEN),
        (G1.neg(G1_GEN), G2.mul(G2_GEN, a)),
    ]
    assert not pairing_check(bad)


def test_final_exponentiation_chain_exponent():
    """The u-addition chain computes f^(c*lambda) with the standard
    Fuentes-Castaneda multiple c = 2u(6u^2+3u+1) — validated symbolically
    by replaying the chain on integer exponents (conjugate = negate,
    frobenius(k) = *p^k)."""
    from delay_enc_tpu.fields.bn254 import BN_U as u, FQ_MOD as p, FR_MOD as r

    lam = (p**4 - p**2 + 1) // r
    R = 1
    y0 = -(R * u)
    y1 = 2 * y0
    y2 = 2 * y1
    y3 = y2 + y1
    y4 = -(y3 * u)
    y5 = 2 * y4
    y6 = -(-(y5 * u))
    y3 = -y3
    y7 = y6 + y4
    y8 = y7 + y3
    y9 = y8 + y1
    y10 = y8 + y4
    y11 = y10 + R
    y13 = y9 * p + y11
    y14 = y8 * p * p + y13
    y15 = (-R + y9) * p**3
    e = y15 + y14
    assert e == 2 * u * (6 * u * u + 3 * u + 1) * lam


def test_fast_vs_direct_final_exponentiation():
    """fast = direct^c for the fixed multiple c (both on a Miller-loop
    output), and both agree on is_one for pairing products."""
    from delay_enc_tpu.curves.pairing import (
        final_exponentiation,
        final_exponentiation_direct,
        miller_loop,
    )
    from delay_enc_tpu.fields.bn254 import BN_U as u

    f = miller_loop(G1.mul(G1_GEN, 7), G2.mul(G2_GEN, 11))
    fast = final_exponentiation(f)
    direct = final_exponentiation_direct(f)
    c = 2 * u * (6 * u * u + 3 * u + 1)
    assert fast == direct.pow(c)
    assert fast.is_one() == direct.is_one() == False  # noqa: E712


def test_prepared_miller_matches_unprepared():
    """G2Prepared lines + shared-squaring multi loop == plain miller loops."""
    from delay_enc_tpu.curves.pairing import (
        G2Prepared, miller_loop, multi_miller_loop_prepared,
    )

    q1 = G2.mul(G2_GEN, 98765)
    q2 = G2.mul(G2_GEN, 4242)
    p1 = G1.mul(G1_GEN, 31337)
    p2 = G1.mul(G1_GEN, 777)
    plain = miller_loop(p1, q1) * miller_loop(p2, q2)
    prepped = multi_miller_loop_prepared(
        [(p1, G2Prepared(q1)), (p2, G2Prepared(q2))]
    )
    assert plain == prepped


def test_pairing_check_accepts_prepared():
    from delay_enc_tpu.curves.pairing import G2Prepared

    a = 9999
    ok = [
        (G1.mul(G1_GEN, a), G2Prepared(G2_GEN)),
        (G1.neg(G1_GEN), G2Prepared(G2.mul(G2_GEN, a))),
    ]
    assert pairing_check(ok)
    bad = [
        (G1.mul(G1_GEN, a + 1), G2Prepared(G2_GEN)),
        (G1.neg(G1_GEN), G2Prepared(G2.mul(G2_GEN, a))),
    ]
    assert not pairing_check(bad)


def test_cyclotomic_square_matches_generic():
    """cyclotomic_square == square on cyclotomic-subgroup elements."""
    f = pairing(G1.mul(G1_GEN, 5), G2.mul(G2_GEN, 31))
    g = f
    for _ in range(4):
        assert g.cyclotomic_square() == g.square()
        g = g.square() * f


def test_mul_by_034_matches_full_mul():
    from delay_enc_tpu.fields.bn254 import Fq2, Fq6

    f = pairing(G1.mul(G1_GEN, 3), G2.mul(G2_GEN, 17))
    c0, c3, c4 = Fq2(123, 456), Fq2(789, 1011), Fq2(1213, 1415)
    sparse = Fq12(Fq6(c0, Fq2.zero(), Fq2.zero()), Fq6(c3, c4, Fq2.zero()))
    assert f.mul_by_034(c0, c3, c4) == f * sparse


def test_native_pairing_check_matches_python():
    """The C pairing path (ecops.c) must agree with the pure-Python tower
    on accept AND reject, including identity G1 inputs."""
    from delay_enc_tpu.curves.pairing import (
        G2Prepared, final_exponentiation, multi_miller_loop_prepared,
    )
    from delay_enc_tpu.native import get_eclib
    from delay_enc_tpu.native.ec import pairing_check_native

    if get_eclib() is None:
        pytest.skip("no C compiler")
    a = 31415926
    good = [
        (G1.mul(G1_GEN, a), G2Prepared(G2_GEN)),
        (G1.neg(G1_GEN), G2Prepared(G2.mul(G2_GEN, a))),
    ]
    bad = [(G1.mul(G1_GEN, a + 1), good[0][1]), good[1]]
    with_id = [(None, good[0][1])] + good
    for pairs in (good, bad, with_id):
        py = final_exponentiation(multi_miller_loop_prepared(
            [(p, q) for p, q in pairs if p is not None]
        )).is_one()
        assert pairing_check_native(pairs) == py
    assert pairing_check_native(good) is True
    assert pairing_check_native(bad) is False


def test_native_pairing_check_mt_matches_single_thread(monkeypatch):
    """The threaded pairing path (pairing_check_prepared_mt, capped at
    nthreads contiguous blocks) must agree with the single-thread kernel
    for every thread count, including all-dead blocks (identity G1)."""
    from delay_enc_tpu.curves.pairing import G2Prepared
    from delay_enc_tpu.native import get_eclib
    from delay_enc_tpu.native.ec import pairing_check_native, verify_threads

    if get_eclib() is None:
        pytest.skip("no C compiler")
    a = 271828
    good = [
        (G1.mul(G1_GEN, a), G2Prepared(G2_GEN)),
        (G1.neg(G1_GEN), G2Prepared(G2.mul(G2_GEN, a))),
    ]
    # pad with identity pairs so some thread blocks hold only dead pairs
    padded = [(None, good[0][1]), (None, good[0][1])] + good + [(None, good[1][1])]
    bad = [good[0], (G1.mul(G1_GEN, a + 1), good[1][1])]
    for n in ("0", "1", "2", "3", "8"):
        monkeypatch.setenv("DELAY_ENC_VERIFY_THREADS", n)
        assert verify_threads() == min(max(int(n), 1), 8)
        assert pairing_check_native(good) is True
        assert pairing_check_native(padded) is True
        assert pairing_check_native(bad) is False


def test_decompress_batch_mt_matches_single_thread(monkeypatch):
    """g1_decompress_batch routes through the MT kernel for n>=8 — results
    must be identical to the single-thread path, and invalid encodings
    must still raise."""
    from delay_enc_tpu.curves.bn254 import B1 as B_CURVE
    from delay_enc_tpu.curves.bn254 import g1_to_bytes
    from delay_enc_tpu.native import get_eclib
    from delay_enc_tpu.native.ec import g1_decompress_batch

    if get_eclib() is None:
        pytest.skip("no C compiler")
    pts = [G1.mul(G1_GEN, 7 * i + 3) for i in range(1, 12)]
    blobs = b"".join(g1_to_bytes(p) for p in pts) + g1_to_bytes(None)
    n = len(pts) + 1
    monkeypatch.setenv("DELAY_ENC_VERIFY_THREADS", "1")
    single = g1_decompress_batch(blobs, n, B_CURVE)
    monkeypatch.setenv("DELAY_ENC_VERIFY_THREADS", "4")
    multi = g1_decompress_batch(blobs, n, B_CURVE)
    assert single == multi
    assert multi[:-1] == pts and multi[-1] is None
    corrupt = bytearray(blobs)
    corrupt[5] ^= 0x01
    with pytest.raises(ValueError):
        g1_decompress_batch(bytes(corrupt), n, B_CURVE)
