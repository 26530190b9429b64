import numpy as np

from delay_enc_tpu.curves.bn254 import (
    G1,
    G2,
    G1_GEN,
    G2_GEN,
    g1_from_bytes,
    g1_to_bytes,
)
from delay_enc_tpu.fields import FR


def test_generators_on_curve():
    assert G1.is_on_curve(G1_GEN)
    assert G2.is_on_curve(G2_GEN)


def test_g1_group_laws():
    two = G1.double(G1_GEN)
    three = G1.add(two, G1_GEN)
    assert three == G1.mul(G1_GEN, 3)
    assert G1.add(three, G1.neg(three)) is None
    assert G1.add(None, two) == two
    # order r
    assert G1.mul(G1_GEN, FR.p) is None


def test_g2_group_laws():
    two = G2.double(G2_GEN)
    assert G2.add(two, G2.neg(two)) is None
    assert G2.add(two, G2_GEN) == G2.mul(G2_GEN, 3)
    assert G2.mul(G2_GEN, FR.p) is None


def test_scalar_mul_distributes():
    rng = np.random.default_rng(0)
    a, b = FR.random(rng), FR.random(rng)
    lhs = G1.mul(G1_GEN, (a + b) % FR.p)
    rhs = G1.add(G1.mul(G1_GEN, a), G1.mul(G1_GEN, b))
    assert lhs == rhs


def test_g1_serialization_roundtrip():
    for k in [1, 2, 12345]:
        pt = G1.mul(G1_GEN, k)
        assert g1_from_bytes(g1_to_bytes(pt)) == pt
    assert g1_from_bytes(g1_to_bytes(None)) is None
