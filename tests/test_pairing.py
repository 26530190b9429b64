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
