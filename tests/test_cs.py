"""Constraint-system layer tests: maingate ops, range chip, mock prover,
positive/negative pairs (the reference's TestBad* pattern,
big_integer/chip.rs:1393-1477)."""

import pytest

from delay_enc_tpu.cs import Builder, MainGate, RangeChip, Term, mock_prove
from delay_enc_tpu.cs.mock import mock_failures
from delay_enc_tpu.fields import FR, PASTA_FP


@pytest.fixture(params=[FR, PASTA_FP], ids=["bn254", "pasta"])
def field(request):
    return request.param


def test_arith_ops_satisfy(field):
    b = Builder(field)
    mg = MainGate(b)
    x = mg.assign_value(7)
    y = mg.assign_value(11)
    s = mg.add(x, y)
    d = mg.sub(x, y)
    m = mg.mul(x, y)
    ma = mg.mul_add(x, y, s)
    mac = mg.mul_add_constant(x, y, 5)
    ac = mg.add_constant(x, 3)
    awc = mg.add_with_constant(x, y, 9)
    assert s.value == 18 and d.value == (7 - 11) % field.p and m.value == 77
    assert ma.value == 77 + 18 and mac.value == 82 and ac.value == 10 and awc.value == 27
    mock_prove(b)


def test_boolean_and_select(field):
    b = Builder(field)
    mg = MainGate(b)
    one = mg.assign_bit(1)
    zero = mg.assign_bit(0)
    assert mg.and_(one, zero).value == 0
    assert mg.or_(one, zero).value == 1
    assert mg.not_(one).value == 0
    x = mg.assign_value(42)
    y = mg.assign_value(99)
    assert mg.select(x, y, one).value == 42
    assert mg.select(x, y, zero).value == 99
    mock_prove(b)


def test_predicates_and_assertions(field):
    b = Builder(field)
    mg = MainGate(b)
    x = mg.assign_value(5)
    y = mg.assign_value(5)
    z = mg.assign_value(0)
    assert mg.is_zero(z).value == 1
    assert mg.is_zero(x).value == 0
    assert mg.is_equal(x, y).value == 1
    mg.assert_equal(x, y)
    mg.assert_zero(z)
    mg.assert_one(mg.assign_value(1))
    mock_prove(b)


@pytest.mark.parametrize("n_terms", [1, 2, 3, 4, 5, 7, 8, 11])
def test_compose_sizes(field, n_terms):
    b = Builder(field)
    mg = MainGate(b)
    cells = [mg.assign_value(i + 1) for i in range(n_terms)]
    coeffs = [3 * i + 2 for i in range(n_terms)]
    r = mg.compose([Term(c, k) for c, k in zip(cells, coeffs)], constant=17)
    assert r.value == (sum((i + 1) * k for i, k in enumerate(coeffs)) + 17) % field.p
    mock_prove(b)


def test_to_bits(field):
    b = Builder(field)
    mg = MainGate(b)
    x = mg.assign_value(0b10110)
    bits = mg.to_bits(x, 5)
    assert [bit.value for bit in bits] == [0, 1, 1, 0, 1]
    mock_prove(b)


@pytest.mark.parametrize("value,sub_bits,bit_len", [
    (200, 8, 8),
    (0xFFFF, 8, 16),
    ((1 << 64) - 1, 8, 64),
    (12345, 8, 70),   # overflow sublimb of 6 bits
    (5, 4, 6),        # overflow sublimb of 2 bits
])
def test_range_assign(field, value, sub_bits, bit_len):
    b = Builder(field)
    rc = RangeChip(b)
    cell = rc.assign(value, sub_bits, bit_len)
    assert cell.value == value % field.p
    mock_prove(b)


def test_range_rejects_oversize():
    b = Builder(FR)
    rc = RangeChip(b)
    with pytest.raises(AssertionError):
        rc.assign(1 << 20, 8, 16)


def test_negative_bad_copy_detected():
    # assert_equal on differing witnesses -> copy failure at mock time
    b = Builder(FR)
    mg = MainGate(b)
    x = mg.assign_value(1)
    y = mg.assign_value(2)
    mg.assert_equal(x, y)
    fails = mock_failures(b)
    assert any(f.kind == "copy" for f in fails)


def test_negative_bad_gate_detected():
    b = Builder(FR)
    mg = MainGate(b)
    x = mg.assign_value(3)
    y = mg.assign_value(4)
    s = mg.add(x, y)
    # tamper with the witness post-hoc: the sum cell lies
    b.advice[s.col][s.row] = 999
    fails = mock_failures(b)
    assert any(f.kind == "gate" for f in fails)


def test_negative_bad_lookup_detected():
    b = Builder(FR)
    rc = RangeChip(b)
    cell = rc.assign(200, 8, 16)
    # tamper a tagged sublimb beyond its width after the fact
    b.lookup_widths.add(8)
    b.advice[0][cell.row - 0] = 300  # final-row wire 'a' holds an 8-bit sublimb
    fails = mock_failures(b)
    assert fails  # gate (composition) and/or lookup failure


def test_copy_cycles():
    b = Builder(FR)
    mg = MainGate(b)
    x = mg.assign_value(5)
    y = mg.add(x, x)  # x copied twice into the row
    cycles = b.permutation_cycles()
    # x's source cell and both row wires are one cycle
    assert any(len(c) >= 3 for c in cycles)
    mock_prove(b)
