"""Differential + golden-vector tests: jnp Poseidon vs the exact oracle.

Replicates the reference's test intent (test_poseidon.cpp: determinism,
input sensitivity, asymmetry, field-bound outputs) but adds what it lacks
(SURVEY.md §4): hard golden vectors and batch-vs-scalar agreement.
"""

import random

import numpy as np
import pytest

from cuzk_tpu import oracle, poseidon
from cuzk_tpu.field import fr

rng = random.Random(777)


def rand_reduced(n):
    return [rng.randrange(oracle.P) for _ in range(n)]


def test_permutation_golden():
    st = fr.ints_to_array([1, 2, 3]).reshape(1, 3, fr.NDIGITS)
    out = fr.array_to_ints(poseidon.permutation(st))
    assert out == oracle.permutation([1, 2, 3])


def test_permutation_matches_oracle_batch():
    states = [[rng.randrange(oracle.P) for _ in range(3)] for _ in range(32)]
    arr = np.stack([fr.ints_to_array(s) for s in states])  # [32, 3, 16]
    got = fr.array_to_ints(poseidon.permutation(arr))
    want = []
    for s in states:
        want.extend(oracle.permutation(s))
    assert got == want


def test_hash_golden_vectors():
    assert poseidon.hash_single_int(42) == oracle.hash_single(42)
    assert poseidon.hash_pair_int(10, 20) == int(
        "0x2dd359f92d31c747e06c02b360a9f5c761777b285edcf09724efef5cbd51d9ba", 16
    )
    assert poseidon.hash_pair_int(42, 0) == int(
        "0x0f6e1adbcd1de3d6161cd9cfc7dad8c98d9acedc903b3e94c2cc8df4c3001580", 16
    )
    assert poseidon.hash_multiple_int([1, 2, 3, 4]) == int(
        "0x2c12b96d3926e4862876ae9ca67cddad85313fa6fa5f266fb7ab683826a6a497", 16
    )
    assert poseidon.hash_multiple_int([]) == 0


def test_hash_single_batch_vs_oracle():
    xs = rand_reduced(64) + [0, 1, oracle.P - 1]
    # also unreduced canonical inputs (absorb add handles them)
    xs += [rng.randrange(1 << 256) for _ in range(8)]
    got = fr.array_to_ints(poseidon.hash_single(fr.ints_to_array(xs)))
    assert got == [oracle.hash_single(x) for x in xs]


def test_hash_pair_batch_vs_oracle():
    ls, rs = rand_reduced(48), rand_reduced(48)
    got = fr.array_to_ints(
        poseidon.hash_pair(fr.ints_to_array(ls), fr.ints_to_array(rs))
    )
    assert got == [oracle.hash_pair(l, r) for l, r in zip(ls, rs)]


@pytest.mark.parametrize("n", [1, 3, 4, 8])
def test_hash_multiple_all_widths(n):
    batch = 8
    inputs = [[rng.randrange(oracle.P) for _ in range(n)] for _ in range(batch)]
    arr = np.stack([fr.ints_to_array(row) for row in inputs])  # [batch, n, 16]
    got = fr.array_to_ints(poseidon.hash_multiple(arr))
    assert got == [oracle.hash_multiple(row) for row in inputs]


def test_empty_input_batch():
    arr = np.zeros((4, 0, fr.NDIGITS), np.uint32)
    got = fr.array_to_ints(poseidon.hash_multiple(arr))
    assert got == [0, 0, 0, 0]


def test_output_in_field_and_deterministic():
    xs = fr.ints_to_array(rand_reduced(32))
    h1 = poseidon.hash_single(xs)
    h2 = poseidon.hash_single(xs)
    assert fr.array_to_ints(h1) == fr.array_to_ints(h2)
    assert all(v < oracle.P for v in fr.array_to_ints(h1))


def test_pair_asymmetry_and_sensitivity():
    a, b = rand_reduced(2)
    hab = poseidon.hash_pair_int(a, b)
    hba = poseidon.hash_pair_int(b, a)
    assert hab != hba
    assert poseidon.hash_single_int(a) != poseidon.hash_single_int(a ^ 1)


def test_permutation_unreduced_states_match_oracle():
    """Round 0's RC-add is the only op that can see unreduced state; the
    public permutation must use the oracle's full wrap-at-2^256 add there
    (the reference's batch_permutation adds with full reduction,
    poseidon_cuda.cu:184-206)."""
    states = [[rng.randrange(1 << 256) for _ in range(3)] for _ in range(8)]
    # Include adversarial wrap cases: state + RC[i] crossing 2^256.
    states.append([(1 << 256) - 1, (1 << 256) - oracle.RC[1], oracle.P])
    arr = np.stack([fr.ints_to_array(s) for s in states])
    got = fr.array_to_ints(poseidon.permutation(arr))
    want = []
    for s in states:
        want.extend(oracle.permutation(s))
    assert got == want
