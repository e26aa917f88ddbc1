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


# ---------------------------------------------------------------------------
# Native exact-grouping scheduler (scheduler.cpp): must produce the exact
# byte-equality partitions (checked against a brute-force dict) and drive
# the dedup verify schedule to the same decisions as the numpy
# bucket-and-confirm fallback.
# ---------------------------------------------------------------------------

import numpy as np


def test_scheduler_builds():
    assert native.scheduler_available()


def test_group_rows_matches_bruteforce():
    nprng = np.random.default_rng(7)
    rows = nprng.integers(0, 3, (1000, 16), dtype=np.uint32)  # many dups
    first, inv = native.group_rows(rows)
    seen: dict = {}
    ref = np.array([seen.setdefault(tuple(r), len(seen)) for r in rows])
    # ids are first-occurrence ranks -> must EQUAL brute force exactly
    assert np.array_equal(inv, ref)
    for g in range(len(first)):
        assert first[g] == int(np.flatnonzero(inv == g)[0])
    # strided view rows (the per-level sibling slices are strided)
    big = nprng.integers(0, 2, (500, 4, 24), dtype=np.uint32)
    view = big[:, 2, :]
    f2, i2 = native.group_rows(view)
    seen = {}
    ref2 = np.array([seen.setdefault(tuple(r), len(seen)) for r in view])
    assert np.array_equal(i2, ref2)


def test_group_triples_matches_bruteforce():
    nprng = np.random.default_rng(9)
    a = nprng.integers(0, 6, 2000).astype(np.int32)
    b = nprng.integers(0, 6, 2000).astype(np.int32)
    c = nprng.integers(0, 4, 2000).astype(np.int32)
    first, inv = native.group_triples(a, b, c)
    seen: dict = {}
    ref = np.array(
        [seen.setdefault((x, y, z), len(seen)) for x, y, z in zip(a, b, c)]
    )
    assert np.array_equal(inv, ref)
    assert len(first) == len(seen)


def test_dedup_schedule_native_equals_numpy_path(monkeypatch):
    """The dedup verify must reach identical decisions (same job counts,
    same wire size, same per-proof verdicts on honest AND tampered
    batches) whether the groupings come from the native hash map or the
    numpy bucket-and-confirm fallback."""
    from cuzk_tpu import merkle

    arity, n = 4, 64
    xs = rand_reduced(n)
    from cuzk_tpu.field import fr

    leaves = np.array([fr.int_to_digits(x) for x in xs], np.uint32)
    tree = merkle.NaryMerkleTree(leaves, merkle.MerkleConfig(arity))
    idx = np.arange(300) % n
    pos, sib = tree.generate_batch_proofs(idx)
    pos = np.asarray(pos, np.int32)
    sib = np.asarray(sib, np.uint32)
    lv = np.asarray(tree.levels[0])[idx]
    root = np.asarray(tree.get_root_hash(), np.uint32)
    bad_lv = lv.copy()
    bad_lv[11, 0] ^= 1

    results = {}
    for label, forced in (("native", None), ("numpy", False)):
        monkeypatch.setattr(merkle, "_native_sched", forced)
        wire = merkle._dedup_pack(pos, sib, lv, root, arity)
        assert wire is not None
        results[label] = (
            wire.sizes, wire.tb, wire.packed.nbytes,
            merkle.verify_each(pos, sib, lv, root, arity, dedupe=True),
            merkle.verify_each(pos, sib, bad_lv, root, arity, dedupe=True),
        )
    assert results["native"][0] == results["numpy"][0]
    assert results["native"][1] == results["numpy"][1]
    assert results["native"][2] == results["numpy"][2]
    np.testing.assert_array_equal(results["native"][3], results["numpy"][3])
    np.testing.assert_array_equal(results["native"][4], results["numpy"][4])
    assert results["native"][3].all()
    assert not results["native"][4][11] and results["native"][4].sum() == 299
