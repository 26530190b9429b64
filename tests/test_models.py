"""Top-level circuit tests (mock-prover level), mirroring the reference's
test_delay_enc_circuit (src/lib.rs:321-363) and the mod_pow bench circuit.
Full-size 2048-bit parameters, 5-bit exponent window."""

import numpy as np
import pytest

from delay_enc_tpu.cs.mock import mock_failures
from delay_enc_tpu.fields import FR
from delay_enc_tpu.models import DelayEncryptCircuit, RSACircuit
from delay_enc_tpu.poseidon import get_spec


@pytest.fixture(scope="module")
def spec():
    return get_spec(FR, 5, 4, 8, 57)


def _params(seed, bits=2048, exp_bits=5):
    rng = np.random.default_rng(seed)
    n = 0
    while n.bit_length() != bits:
        n = int.from_bytes(bytes(rng.integers(0, 256, bits // 8, dtype="uint8")), "little")
    e = int(rng.integers(0, 1 << exp_bits))
    x = int.from_bytes(bytes(rng.integers(0, 256, bits // 8, dtype="uint8")), "little") % n
    return n, e, x


def test_mod_pow_circuit():
    n, e, x = _params(0)
    b = RSACircuit(n=n, e=e, x=x, field=FR).build()
    assert mock_failures(b) == []
    # row count comparable to the reference (41766 advice @ 5-bit T, k=16)
    assert b.rows < (1 << 16)


def test_delay_enc_circuit(spec):
    # mirrors test_delay_enc_circuit: random n/e/x, zero message
    n, e, x = _params(1)
    circuit = DelayEncryptCircuit(
        n=n, e=e, x=x, spec=spec, num_input=2, message=[0, 0]
    )
    b = circuit.build()
    assert mock_failures(b) == []
    assert b.rows < (1 << 16)


def test_delay_enc_bad_witness_detected(spec):
    n, e, x = _params(2)
    circuit = DelayEncryptCircuit(
        n=n, e=e, x=x, spec=spec, num_input=2, message=[0, 0]
    )
    b = circuit.build()
    # corrupt one advice cell in the modpow region
    b.advice[0][500] = (b.advice[0][500] + 1) % FR.p
    assert mock_failures(b)
