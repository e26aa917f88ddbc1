"""Triple-differential tests: C++ native oracle vs Python-int oracle.

The native library is an independent 4x64-limb implementation of the
reference semantics (the role the reference's C++ CPU path plays); it must
agree with the Python oracle on every op and golden vector.
"""

import random
import shutil

import pytest

from cuzk_tpu import oracle

native = pytest.importorskip("cuzk_tpu.native")

if shutil.which("g++") is None:
    pytest.skip("g++ not available", allow_module_level=True)

rng = random.Random(2024)


def rand_reduced(n):
    return [rng.randrange(oracle.P) for _ in range(n)]


def rand_full(n):
    return [rng.randrange(1 << 256) for _ in range(n)]


def test_native_builds():
    assert native.available()


def test_field_ops_match_oracle():
    for a, b in zip(rand_full(32), rand_full(32)):
        assert native.add(a, b) == oracle.add(a, b)
        assert native.sub(a, b) == oracle.sub(a, b)
        assert native.mul(a, b) == oracle.mul(a, b)
        assert native.red(a) == oracle.red(a)
        assert native.power5(a) == oracle.power5(a)
    # adversarial extremes
    top = (1 << 256) - 1
    for a, b in [(top, top), (0, 0), (oracle.P, oracle.P), (1, top)]:
        assert native.mul(a, b) == oracle.mul(a, b)
        assert native.add(a, b) == oracle.add(a, b)


def test_permutation_golden():
    assert native.permutation([1, 2, 3]) == oracle.permutation([1, 2, 3])


def test_hash_golden():
    assert native.hash_single(42) == oracle.hash_single(42)
    assert native.hash_pair(10, 20) == oracle.hash_pair(10, 20)
    assert native.hash_multiple([1, 2, 3, 4]) == oracle.hash_multiple([1, 2, 3, 4])
    assert native.hash_multiple([]) == 0


def test_batch_and_random_hashes():
    ls, rs = rand_reduced(16), rand_reduced(16)
    assert native.batch_hash_pairs(ls, rs) == [
        oracle.hash_pair(l, r) for l, r in zip(ls, rs)
    ]


@pytest.mark.parametrize("arity,count", [(2, 4), (3, 5), (8, 9)])
def test_merkle_root_matches(arity, count):
    xs = rand_reduced(count)
    assert native.merkle_root(xs, arity) == oracle.merkle_root(xs, arity)
