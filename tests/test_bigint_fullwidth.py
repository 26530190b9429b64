"""Full-width BigIntChip edge-case matrix: the reference's structured
MulCase1..7 / MulModCase1..4 circuits at the production configuration
(limb_width=64, bits_len=2048), ported from
/root/reference/src/big_integer/chip.rs:2806-3282.

The reduced-width suite (test_bigint.py) covers the API broadly; this file
pins the exact polynomial identities the reference stamps at k=16 full
width, plus negative twins so a broken carry/limb path can't pass by luck.
Mock-prover only (cheap): each case is a few hundred gate rows.
"""

import numpy as np
import pytest

from delay_enc_tpu.cs import Builder
from delay_enc_tpu.cs.mock import mock_failures
from delay_enc_tpu.fields import FR, PASTA_FP, PASTA_FQ
from delay_enc_tpu.gadgets.big_integer import (
    BigIntChip,
    decompose_big,
)

LIMB_WIDTH = 64
BITS_LEN = 2048
NUM_LIMBS = BITS_LEN // LIMB_WIDTH
BASE = 1 << LIMB_WIDTH


@pytest.fixture(params=[FR, PASTA_FP, PASTA_FQ], ids=["bn254", "pasta_fp", "pasta_fq"])
def field(request):
    return request.param


def _chip(field):
    b = Builder(field)
    return b, BigIntChip(b, LIMB_WIDTH, BITS_LEN)


def _rand_n(rng):
    """Random modulus with exactly BITS_LEN bits (chip.rs:1445-1449)."""
    v = int.from_bytes(bytes(rng.integers(0, 256, BITS_LEN // 8, dtype="uint8")), "little")
    return v | (1 << (BITS_LEN - 1))


def _assign(chip, v, n=NUM_LIMBS):
    return chip.assign_integer(decompose_big(v, n, LIMB_WIDTH))


def _poly(*coeffs):
    """sum(coeffs[i] * BASE^i) — the reference's out_base polynomials."""
    return sum(c * BASE**i for i, c in enumerate(coeffs))


def test_mul_case1(field):
    """1 * 1 = 1 (TestMulCase1Circuit, chip.rs:2806-2837)."""
    b, chip = _chip(field)
    one = chip.assign_constant_fresh(1)
    n = one.num_limbs()
    one_muled = chip.mul(one, one)
    chip.assert_equal_muled(chip.to_muled(one), one_muled, n, n)
    assert mock_failures(b) == []


def test_mul_case3(field):
    """(1+0x+3x^2)(3+1x) = 3+1x+9x^2+3x^3 (chip.rs:2839-2880)."""
    b, chip = _chip(field)
    a = chip.assign_constant_fresh(_poly(1, 0, 3))
    bb = chip.assign_constant_fresh(_poly(3, 1, 0))
    n1, n2 = a.num_limbs(), bb.num_limbs()
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(_poly(3, 1, 9, 3), n1, n2)
    chip.assert_equal_muled(ab, ans, n1, n2)
    assert mock_failures(b) == []


def test_mul_case4(field):
    """(3+4x+5x^2+6x^3)(9+10x+11x^2+12x^3) (chip.rs:2882-2921)."""
    b, chip = _chip(field)
    a = chip.assign_constant_fresh(_poly(3, 4, 5, 6))
    bb = chip.assign_constant_fresh(_poly(9, 10, 11, 12))
    n1, n2 = a.num_limbs(), bb.num_limbs()
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(_poly(27, 66, 118, 184, 163, 126, 72), n1, n2)
    chip.assert_equal_muled(ab, ans, n1, n2)
    assert mock_failures(b) == []


def test_mul_case5(field):
    """Big square: 1024-bit operand squared, answer recomputed rather than
    transcribed from the reference's 32 hard-coded coefficients
    (chip.rs:2923-3032) — same identity, same widths."""
    b, chip = _chip(field)
    coeffs = [
        4819187580044832333, 9183764011217009606, 11426964127496009747,
        17898263845095661790, 12102522037140783322, 4029304176671511763,
        11339410859987005436, 12120243430436644729, 2888435820322958146,
        7612614626488966390, 3872170484348249672, 9589147526444685354,
        16391157694429928307, 12256166884204507566, 4257963982333550934,
        916988490704,
    ]
    a_big = _poly(*coeffs)
    a = chip.assign_constant_fresh(a_big)
    n1 = a.num_limbs()
    sq = chip.square(a)
    ans = chip.assign_constant_muled(a_big * a_big, n1, n1)
    chip.assert_equal_muled(sq, ans, n1, n1)
    assert mock_failures(b) == []


def test_mul_case6(field):
    """(1+x)(1+x+x^2) = 1+2x+2x^2+x^3 (chip.rs:3034-3074)."""
    b, chip = _chip(field)
    a = chip.assign_constant_fresh(_poly(1, 1))
    bb = chip.assign_constant_fresh(_poly(1, 1, 1))
    n1, n2 = a.num_limbs(), bb.num_limbs()
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(_poly(1, 2, 2, 1), n1, n2)
    chip.assert_equal_muled(ab, ans, n1, n2)
    assert mock_failures(b) == []


def test_mul_case7(field):
    """(1+7x)(1+x+x^2) = 1+8x+8x^2+7x^3 (chip.rs:3076-3116)."""
    b, chip = _chip(field)
    a = chip.assign_constant_fresh(_poly(1, 7))
    bb = chip.assign_constant_fresh(_poly(1, 1, 1))
    n1, n2 = a.num_limbs(), bb.num_limbs()
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(_poly(1, 8, 8, 7), n1, n2)
    chip.assert_equal_muled(ab, ans, n1, n2)
    assert mock_failures(b) == []


def test_mulmod_case1(field):
    """0 * random = 0 mod n (TestMulModCase1Circuit, chip.rs:3118-3157)."""
    rng = np.random.default_rng(101)
    b, chip = _chip(field)
    n_v = _rand_n(rng)
    b_v = _rand_n(rng) % n_v
    zero = chip.assign_constant_fresh(0)
    ab = chip.mul_mod(zero, _assign(chip, b_v), _assign(chip, n_v))
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(0))
    assert mock_failures(b) == []


def test_mulmod_case2(field):
    """n * 1 mod n = 0 (chip.rs:3159-3197)."""
    rng = np.random.default_rng(102)
    b, chip = _chip(field)
    n_v = _rand_n(rng)
    one = chip.assign_constant_fresh(1)
    ab = chip.mul_mod(_assign(chip, n_v), one, _assign(chip, n_v))
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(0))
    assert mock_failures(b) == []


def test_mulmod_case3(field):
    """(n-1)^2 mod n = 1 (chip.rs:3199-3239)."""
    rng = np.random.default_rng(103)
    b, chip = _chip(field)
    n_v = _rand_n(rng)
    a = _assign(chip, n_v - 1)
    bb = _assign(chip, n_v - 1)
    ab = chip.mul_mod(a, bb, _assign(chip, n_v))
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(1))
    assert mock_failures(b) == []


def test_mulmod_case4(field):
    """(n-1)(n-2) mod n = 2 (chip.rs:3241-3282)."""
    rng = np.random.default_rng(104)
    b, chip = _chip(field)
    n_v = _rand_n(rng)
    ab = chip.mul_mod(
        _assign(chip, n_v - 1), _assign(chip, n_v - 2), _assign(chip, n_v)
    )
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(2))
    assert mock_failures(b) == []


def test_bad_mulmod_fullwidth(field):
    """Negative twin: asserting (n-1)^2 mod n = 2 must fail — guards the
    full-width carry path against vacuous-pass regressions."""
    rng = np.random.default_rng(105)
    b, chip = _chip(field)
    n_v = _rand_n(rng)
    ab = chip.mul_mod(
        _assign(chip, n_v - 1), _assign(chip, n_v - 1), _assign(chip, n_v)
    )
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(2))
    assert mock_failures(b)


def test_bad_mul_fullwidth(field):
    """Negative twin for full-width mul: off-by-one product rejected."""
    b, chip = _chip(field)
    a = chip.assign_constant_fresh(_poly(3, 4, 5, 6))
    bb = chip.assign_constant_fresh(_poly(9, 10, 11, 12))
    n1, n2 = a.num_limbs(), bb.num_limbs()
    ab = chip.mul(a, bb)
    wrong = chip.assign_constant_muled(
        _poly(28, 66, 118, 184, 163, 126, 72), n1, n2
    )
    chip.assert_equal_muled(ab, wrong, n1, n2)
    assert mock_failures(b)
