"""BigIntChip tests: the reference's impl_bigint_test_circuit! matrix
(big_integer/chip.rs:1393-1477) translated to parametrized pytest cases,
with positive/negative (TestBad*) pairs and multi-field coverage.

Reduced widths (limb_width=32, bits_len=256) keep mock-prover runtimes
test-friendly; the full 64/2048 configuration is exercised by the circuit
tests (test_models.py)."""

import numpy as np
import pytest

from delay_enc_tpu.cs import Builder
from delay_enc_tpu.cs.mock import mock_failures
from delay_enc_tpu.fields import FR, PASTA_FP, PASTA_FQ
from delay_enc_tpu.gadgets.big_integer import (
    AssignedInteger,
    BigIntChip,
    RefreshAux,
    big_pow_mod,
    decompose_big,
)

LIMB_WIDTH = 32
BITS_LEN = 256
NUM_LIMBS = BITS_LEN // LIMB_WIDTH


@pytest.fixture(params=[FR, PASTA_FP, PASTA_FQ], ids=["bn254", "pasta_fp", "pasta_fq"])
def field(request):
    return request.param


def _chip(field):
    b = Builder(field)
    return b, BigIntChip(b, LIMB_WIDTH, BITS_LEN)


def _rand(rng, bits=BITS_LEN):
    return int.from_bytes(bytes(rng.integers(0, 256, bits // 8, dtype="uint8")), "little")


def _assign(chip, v, n=NUM_LIMBS):
    return chip.assign_integer(decompose_big(v, n, LIMB_WIDTH))


def _assert_ok(b):
    assert mock_failures(b) == []


def _assert_bad(b):
    assert mock_failures(b)


def test_add(field):
    rng = np.random.default_rng(0)
    b, chip = _chip(field)
    a_v, b_v = _rand(rng), _rand(rng)
    out = chip.add(_assign(chip, a_v), _assign(chip, b_v))
    assert out.to_big(LIMB_WIDTH) == a_v + b_v
    _assert_ok(b)


def test_sub_no_overflow(field):
    rng = np.random.default_rng(1)
    b, chip = _chip(field)
    a_v, b_v = _rand(rng) | (1 << 255), _rand(rng) >> 1
    out, bit = chip.sub(_assign(chip, a_v), _assign(chip, b_v))
    assert bit.value == 0
    assert out.to_big(LIMB_WIDTH) == a_v - b_v
    _assert_ok(b)


def test_sub_overflow(field):
    rng = np.random.default_rng(2)
    b, chip = _chip(field)
    a_v, b_v = _rand(rng) >> 1, _rand(rng) | (1 << 255)
    out, bit = chip.sub(_assign(chip, a_v), _assign(chip, b_v))
    assert bit.value == 1
    assert out.to_big(LIMB_WIDTH) == b_v - a_v
    _assert_ok(b)


def test_mul_and_refresh(field):
    rng = np.random.default_rng(3)
    b, chip = _chip(field)
    a_v, b_v = _rand(rng), _rand(rng)
    muled = chip.mul(_assign(chip, a_v), _assign(chip, b_v))
    aux = RefreshAux(LIMB_WIDTH, NUM_LIMBS, NUM_LIMBS)
    fresh = chip.refresh(muled, aux)
    assert fresh.to_big(LIMB_WIDTH) == a_v * b_v
    _assert_ok(b)


def test_mul_distributes(field):
    # (a+b)*c == a*c + b*c through refresh (the doc example, mod.rs:109-152)
    rng = np.random.default_rng(4)
    b, chip = _chip(field)
    a_v, b_v, c_v = _rand(rng) >> 1, _rand(rng) >> 1, _rand(rng)
    a, bb, c = _assign(chip, a_v), _assign(chip, b_v), _assign(chip, c_v)
    ab_sum = chip.add(a, bb)
    lhs = chip.refresh(
        chip.mul(ab_sum, c), RefreshAux(LIMB_WIDTH, ab_sum.num_limbs(), NUM_LIMBS)
    )
    ac = chip.refresh(chip.mul(a, c), RefreshAux(LIMB_WIDTH, NUM_LIMBS, NUM_LIMBS))
    bc = chip.refresh(chip.mul(bb, c), RefreshAux(LIMB_WIDTH, NUM_LIMBS, NUM_LIMBS))
    rhs = chip.add(ac, bc)
    chip.assert_equal_fresh(lhs, rhs)
    _assert_ok(b)


def test_add_mod_sub_mod_mul_mod(field):
    rng = np.random.default_rng(5)
    b, chip = _chip(field)
    n_v = _rand(rng) | (1 << 255)
    a_v, b_v = _rand(rng) % n_v, _rand(rng) % n_v
    a, bb, n = _assign(chip, a_v), _assign(chip, b_v), _assign(chip, n_v)
    s = chip.add_mod(a, bb, n)
    assert s.to_big(LIMB_WIDTH) == (a_v + b_v) % n_v
    d = chip.sub_mod(a, bb, n)
    assert d.to_big(LIMB_WIDTH) == (a_v - b_v) % n_v
    m = chip.mul_mod(a, bb, n)
    assert m.to_big(LIMB_WIDTH) == (a_v * b_v) % n_v
    sq = chip.square_mod(a, n)
    assert sq.to_big(LIMB_WIDTH) == (a_v * a_v) % n_v
    _assert_ok(b)


def test_pow_mod_var(field):
    rng = np.random.default_rng(6)
    b, chip = _chip(field)
    n_v = _rand(rng) | (1 << 255)
    a_v = _rand(rng) % n_v
    e_v = 0b10110  # 5-bit
    a, n = _assign(chip, a_v), _assign(chip, n_v)
    e = chip.assign_integer([e_v])
    out = chip.pow_mod(a, e, n, 5)
    assert out.to_big(LIMB_WIDTH) == big_pow_mod(a_v, e_v, n_v)
    _assert_ok(b)


def test_pow_mod_fixed(field):
    rng = np.random.default_rng(7)
    b, chip = _chip(field)
    n_v = _rand(rng) | (1 << 255)
    a_v = _rand(rng) % n_v
    e_v = 65537
    out = chip.pow_mod_fixed_exp(_assign(chip, a_v), e_v, _assign(chip, n_v))
    assert out.to_big(LIMB_WIDTH) == pow(a_v, e_v, n_v)
    _assert_ok(b)


def test_predicates(field):
    rng = np.random.default_rng(8)
    b, chip = _chip(field)
    a_v = _rand(rng) >> 1
    b_v = a_v + 5
    a, bb = _assign(chip, a_v), _assign(chip, b_v)
    assert chip.is_zero(_assign(chip, 0)).value == 1
    assert chip.is_zero(a).value == 0
    assert chip.is_equal_fresh(a, a).value == 1
    assert chip.is_equal_fresh(a, bb).value == 0
    assert chip.is_less_than(a, bb).value == 1
    assert chip.is_less_than_or_equal(a, a).value == 1
    assert chip.is_greater_than(bb, a).value == 1
    assert chip.is_greater_than_or_equal(a, a).value == 1
    assert chip.is_in_field(a, bb).value == 1
    _assert_ok(b)


def test_is_equal_muled(field):
    rng = np.random.default_rng(9)
    b, chip = _chip(field)
    a_v, b_v = _rand(rng), _rand(rng)
    m1 = chip.mul(_assign(chip, a_v), _assign(chip, b_v))
    m2 = chip.mul(_assign(chip, b_v), _assign(chip, a_v))
    assert chip.is_equal_muled(m1, m2, NUM_LIMBS, NUM_LIMBS).value == 1
    _assert_ok(b)


def test_bad_pow_mod_detected(field):
    """TestBadPowModCircuit analog (chip.rs:2281-2322): asserting a wrong
    result must fail the mock prover."""
    rng = np.random.default_rng(10)
    b, chip = _chip(field)
    n_v = _rand(rng) | (1 << 255)
    a_v = _rand(rng) % n_v
    e = chip.assign_integer([0b10011])
    out = chip.pow_mod(_assign(chip, a_v), e, _assign(chip, n_v), 5)
    wrong = chip.assign_constant_fresh((big_pow_mod(a_v, 0b10011, n_v) + 1) % n_v)
    chip.assert_equal_fresh(out, wrong)
    _assert_bad(b)


def test_bad_mul_detected(field):
    rng = np.random.default_rng(11)
    b, chip = _chip(field)
    # operands truncated so the wrong product still fits the Muled limb count
    a_v, b_v = _rand(rng) >> 128, _rand(rng) >> 128
    m = chip.mul(_assign(chip, a_v), _assign(chip, b_v))
    wrong = chip.assign_constant_muled(a_v * b_v + 1, NUM_LIMBS, NUM_LIMBS)
    chip.assert_equal_muled(m, wrong, NUM_LIMBS, NUM_LIMBS)
    _assert_bad(b)


def test_refresh_aux_symmetry():
    # mod.rs:516-533
    rng = np.random.default_rng(12)
    l, r = int(rng.integers(1, 40)), int(rng.integers(1, 40))
    a0 = RefreshAux(LIMB_WIDTH, l, r)
    a1 = RefreshAux(LIMB_WIDTH, r, l)
    assert a0.increased_limbs_vec == a1.increased_limbs_vec


def test_mul_edge_cases(field):
    # MulCase1..: zero, one, max operands (chip.rs:2806-3282 spirit)
    b, chip = _chip(field)
    maxv = (1 << BITS_LEN) - 1
    for a_v, b_v in [(0, 5), (1, maxv), (maxv, 2), (0, 0)]:
        m = chip.mul(_assign(chip, a_v), _assign(chip, b_v))
        expected = chip.assign_constant_muled(a_v * b_v, NUM_LIMBS, NUM_LIMBS)
        chip.assert_equal_muled(m, expected, NUM_LIMBS, NUM_LIMBS)
    _assert_ok(b)
