import numpy as np
import pytest

from delay_enc_tpu.fields import FQ, FR, PASTA_FP, PASTA_FQ
from delay_enc_tpu.fields.bn254 import Fq2, Fq6, Fq12


@pytest.mark.parametrize("F", [FQ, FR, PASTA_FP, PASTA_FQ])
def test_prime_field_basics(F):
    rng = np.random.default_rng(0)
    a, b = F.random(rng), F.random(rng)
    assert F.add(a, F.neg(a)) == 0
    assert F.mul(a, F.inv(a)) == 1
    assert F.mul(F.add(a, b), a) == F.add(F.mul(a, a), F.mul(b, a))
    # Fermat
    assert F.pow(a, F.p - 1) == 1


def test_fr_two_adicity_and_roots():
    assert FR.s == 28
    w = FR.root_of_unity(4)
    assert FR.pow(w, 16) == 1
    assert FR.pow(w, 8) != 1


def test_sqrt():
    rng = np.random.default_rng(1)
    a = FR.random(rng)
    sq = FR.mul(a, a)
    r = FR.sqrt(sq)
    assert r is not None and FR.mul(r, r) == sq


def test_repr_roundtrip():
    rng = np.random.default_rng(2)
    a = FR.random(rng)
    assert FR.from_repr(FR.to_repr(a)) == a


def test_fq2_arith():
    a, b = Fq2(3, 5), Fq2(7, 11)
    assert (a * b) * a.inv() == b
    assert a.square() == a * a
    # u^2 = -1
    u = Fq2(0, 1)
    assert u * u == Fq2(-1 % FQ.p, 0)


def test_fq6_fq12_arith():
    a = Fq6(Fq2(1, 2), Fq2(3, 4), Fq2(5, 6))
    assert a * a.inv() == Fq6.one()
    x = Fq12(a, Fq6(Fq2(7, 8), Fq2(9, 10), Fq2(11, 12)))
    assert (x * x.inv()).is_one()
    assert x.square() == x * x
    # frobenius^12 = identity; frobenius(1) == pow p
    assert x.frobenius(1).frobenius(1) == x.frobenius(2)


def test_fq12_frobenius_is_pow_p():
    a = Fq6(Fq2(1, 2), Fq2(3, 4), Fq2(5, 6))
    x = Fq12(a, Fq6(Fq2(7, 8), Fq2(9, 10), Fq2(11, 12)))
    assert x.frobenius(1) == x.pow(FQ.p)
