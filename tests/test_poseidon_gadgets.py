"""In-circuit Poseidon gadget tests: circuit/native consistency + negative
cases, mirroring the reference's test_pos_enc (encryption/chip.rs:206-242)
and test_example_hash (hash/chip.rs:202-234)."""

import numpy as np
import pytest

from delay_enc_tpu.cs import Builder, MainGate, mock_prove
from delay_enc_tpu.cs.mock import mock_failures
from delay_enc_tpu.encryption import PoseidonCipher
from delay_enc_tpu.fields import FR
from delay_enc_tpu.gadgets import HasherChip, PoseidonChip
from delay_enc_tpu.models import PoseidonEncCircuit
from delay_enc_tpu.poseidon import Poseidon, get_spec
from delay_enc_tpu.poseidon.sponge import permute


@pytest.fixture(scope="module")
def spec():
    return get_spec(FR, 5, 4, 8, 57)


def test_permutation_chip_matches_native(spec):
    b = Builder(FR)
    chip = PoseidonChip.new_hash(b, spec)
    native_state = [w.value for w in chip.state]
    chip.permutation([])
    got = [w.value for w in chip.state]
    assert got == permute(spec, native_state)
    mock_prove(b)


def test_permutation_chip_with_inputs(spec):
    rng = np.random.default_rng(0)
    inputs = [FR.random(rng) for _ in range(3)]
    b = Builder(FR)
    mg = MainGate(b)
    chip = PoseidonChip.new_hash(b, spec)
    state0 = [w.value for w in chip.state]
    cells = [mg.assign_value(v) for v in inputs]
    chip.permutation(cells)
    # native: absorb 3 inputs at words 1..3 then permute (no padding)
    st = list(state0)
    for i, v in enumerate(inputs):
        st[i + 1] = (st[i + 1] + v) % FR.p
    assert [w.value for w in chip.state] == permute(spec, st)
    mock_prove(b)


def test_hasher_chip_matches_native_sponge(spec):
    # 4 inputs => full chunk + extra permutation, mirroring test_example_hash
    n_inputs = 4
    inputs = [0] * n_inputs
    ref = Poseidon.new_hash(spec)
    ref.update(inputs)
    expected = ref.squeeze(1)

    b = Builder(FR)
    mg = MainGate(b)
    hasher = HasherChip(b, spec)
    for v in inputs:
        hasher.update([mg.assign_value(v)])
    out = hasher.hash()
    assert [w.value for w in out] == expected
    mock_prove(b)


def test_hasher_chip_partial_chunk(spec):
    rng = np.random.default_rng(1)
    inputs = [FR.random(rng) for _ in range(11)]  # 4+4+3: partial final chunk
    ref = Poseidon.new_hash(spec)
    ref.update(inputs)
    expected = ref.squeeze(1)

    b = Builder(FR)
    mg = MainGate(b)
    hasher = HasherChip(b, spec)
    for v in inputs:
        hasher.update([mg.assign_value(v)])
    out = hasher.hash()
    assert [w.value for w in out] == expected
    mock_prove(b)


def test_pose_enc_circuit(spec):
    rng = np.random.default_rng(2)
    key = (FR.random(rng), FR.random(rng))
    message = [0, 0]  # reference tests use zero messages (chip.rs:220)
    ref = PoseidonCipher(spec, key)
    expected = ref.encrypt(message, 1)

    circuit = PoseidonEncCircuit(
        spec=spec, num_input=2, message=message, key=key, expected=expected
    )
    b = circuit.build()
    mock_prove(b)
    # row count comparable to reference pose_enc k=11 advice=1450
    assert b.rows < 2048, b.rows


def test_pose_enc_circuit_bad_expected_fails(spec):
    rng = np.random.default_rng(3)
    key = (FR.random(rng), FR.random(rng))
    ref = PoseidonCipher(spec, key)
    expected = ref.encrypt([0, 0], 1)
    expected[0] = (expected[0] + 1) % FR.p  # corrupt
    circuit = PoseidonEncCircuit(
        spec=spec, num_input=2, message=[0, 0], key=key, expected=expected
    )
    fails = mock_failures(circuit.build())
    assert any(f.kind == "copy" for f in fails)
