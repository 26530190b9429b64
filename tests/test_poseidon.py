"""Poseidon native-layer tests.

The hadeshash external test vectors are the same ones the reference checks
(permutation.rs:132-206); they pin the Grain LFSR, Cauchy MDS, optimized
constants and sparse factorization to be bit-exact.
"""

import numpy as np
import pytest

from delay_enc_tpu.fields import FR
from delay_enc_tpu.poseidon import Poseidon, get_spec
from delay_enc_tpu.poseidon.sponge import permute, permute_unoptimized


def test_hadeshash_vector_t3():
    # poseidonperm_x5_254_3 (permutation.rs:132-167)
    spec = get_spec(FR, 3, 2, 8, 57)
    state = permute_unoptimized(spec, [0, 1, 2])
    expected = [
        7853200120776062878684798364095072458815029376092732009249414926327459813530,
        7142104613055408817911962100316808866448378443474503659992478482890339429929,
        6549537674122432311777789598043107870002137484850126429160507761192163713804,
    ]
    assert state == expected
    assert permute(spec, [0, 1, 2]) == expected


def test_hadeshash_vector_t5():
    # poseidonperm_x5_254_5 (permutation.rs:169-205), r_p = 60
    spec = get_spec(FR, 5, 4, 8, 60)
    state = permute_unoptimized(spec, [0, 1, 2, 3, 4])
    expected = [
        18821383157269793795438455681495246036402687001665670618754263018637548127333,
        7817711165059374331357136443537800893307845083525445872661165200086166013245,
        16733335996448830230979566039396561240864200624113062088822991822580465420551,
        6644334865470350789317807668685953492649391266180911382577082600917830417726,
        3372108894677221197912083238087960099443657816445944159266857514496320565191,
    ]
    assert state == expected
    assert permute(spec, [0, 1, 2, 3, 4]) == expected


@pytest.mark.parametrize("t", [3, 4, 5, 6, 7, 8, 9, 10])
def test_optimized_matches_unoptimized(t):
    # cross_test (permutation.rs:83-129): 8 (T, RATE) combos at (8, 57)
    spec = get_spec(FR, t, t - 1, 8, 57)
    rng = np.random.default_rng(t)
    state = [FR.random(rng) for _ in range(t)]
    assert permute(spec, state) == permute_unoptimized(spec, state)


def test_sponge_hash_padding():
    # squeeze(1) appends a ONE pad; equivalent manual absorption must match
    spec = get_spec(FR, 5, 4, 8, 57)
    h = Poseidon.new_hash(spec)
    h.update([10, 20, 30])
    out = h.squeeze(1)

    manual = Poseidon.new_hash(spec)
    state = list(manual.state)
    for i, e in enumerate([10, 20, 30, 1]):
        state[i + 1] = (state[i + 1] + e) % FR.p
    assert out == permute(spec, state)


def test_sponge_full_chunk_permutes_eagerly():
    spec = get_spec(FR, 5, 4, 8, 57)
    h = Poseidon.new_hash(spec)
    h.update([1, 2, 3, 4])  # full RATE chunk -> permutes immediately
    assert h.absorbing == []
    h2 = Poseidon.new_hash(spec)
    h2.update([1, 2])
    assert h2.absorbing == [1, 2]
