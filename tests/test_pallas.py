"""Differential tests: Pallas kernels (interpret mode on CPU) vs the oracle.

The TPU analog of the reference's CPU-oracle/CUDA-accelerator differential
suites (test_poseidon_cuda.cpp:38-114) plus its cross-implementation
verification gate (poseidon_cuda_benchmarks.cpp:137-259): the Pallas path
must agree bit-exactly with both the oracle and the jnp reference path.
"""

import random

import jax
import numpy as np
import pytest

from cuzk_tpu import oracle, poseidon
from cuzk_tpu.field import fr
from cuzk_tpu.ops import fieldslab as fs
from cuzk_tpu.ops import (
    hash_multiple_pallas,
    hash_pair_pallas,
    hash_single_pallas,
    permutation_pallas,
)

rng = random.Random(31337)


def rand_reduced(n):
    return [rng.randrange(oracle.P) for _ in range(n)]


def rand_full(n):
    return [rng.randrange(1 << 256) for _ in range(n)]


def to_slab(xs):
    """ints -> [16, 1, len] slab."""
    arr = fr.ints_to_array(xs)  # [n, 16]
    return arr.T.reshape(fr.NDIGITS, 1, len(xs))


def from_slab(s):
    s = np.asarray(s)
    nd, a, b = s.shape
    return fr.array_to_ints(s.reshape(nd, a * b).T)


# ---------------------------------------------------------------------------
# fieldslab unit differentials (pure jnp, no pallas_call needed)
# ---------------------------------------------------------------------------

def test_slab_carry_roundtrip():
    xs = rand_full(8)
    s = to_slab(xs)
    out, c = fs.carry(s + np.uint32(0))
    assert from_slab(np.asarray(out)) == xs
    assert np.all(np.asarray(c) == 0)


def test_slab_add_sub_red():
    a_i, b_i = rand_reduced(16), rand_reduced(16)
    a, b = to_slab(a_i), to_slab(b_i)
    assert from_slab(fs.add_rr(a, b)) == [oracle.add(x, y) for x, y in zip(a_i, b_i)]
    assert from_slab(fs.sub(a, b)) == [oracle.sub(x, y) for x, y in zip(a_i, b_i)]
    f_i = rand_full(16)
    f = to_slab(f_i)
    assert from_slab(fs.red(f)) == [oracle.red(x) for x in f_i]
    assert from_slab(fs.add_wrap_red(f, to_slab(rand_full(16)))) is not None


def test_slab_add_wrap_red_full_range():
    a_i, b_i = rand_full(16), rand_full(16)
    got = from_slab(fs.add_wrap_red(to_slab(a_i), to_slab(b_i)))
    assert got == [oracle.add(x, y) for x, y in zip(a_i, b_i)]


def test_slab_mul_all_regimes():
    pairs = []
    pairs += [(rng.randrange(1 << 128), rng.randrange(1 << 128)) for _ in range(8)]
    pairs += [(rng.randrange(1, 11), rng.randrange(oracle.P)) for _ in range(8)]
    pairs += list(zip(rand_reduced(16), rand_reduced(16)))
    pairs += list(zip(rand_full(8), rand_full(8)))
    top = (1 << 256) - 1
    pairs += [(top, top), (oracle.P - 1, oracle.P - 1), (0, top), (1, top)]
    a = to_slab([p[0] for p in pairs])
    b = to_slab([p[1] for p in pairs])
    assert from_slab(fs.mul(a, b)) == [oracle.mul(x, y) for x, y in pairs]


def test_slab_power5_and_mul_small():
    xs = rand_reduced(8) + rand_full(4) + [0, 1, oracle.P - 1, (1 << 256) - 1]
    s = to_slab(xs)
    assert from_slab(fs.power5(s)) == [oracle.power5(x) for x in xs]
    for c in list(oracle.MDS) + [0, 1, 65535]:
        assert from_slab(fs.mul_small(s, c)) == [oracle.mul(x, c) for x in xs]


def test_slab_square_and_mul_small_reduced():
    xs = rand_reduced(12) + [0, 1, oracle.P - 1]
    s = to_slab(xs)
    assert from_slab(fs.square(s)) == [oracle.mul(x, x) for x in xs]
    # square also matches on unreduced canonical inputs
    f = rand_full(8)
    assert from_slab(fs.square(to_slab(f))) == [oracle.mul(x, x) for x in f]
    for c in sorted(set(oracle.MDS)):
        got = from_slab(fs.mul_small_reduced(s, c))
        assert got == [oracle.mul(x, c) for x in xs], f"c={c}"


def test_slab_mds_rc_fused_matches_oracle_round():
    """One fused MDS+RC step == the oracle's chained adds."""
    st = rand_reduced(3)
    slabs = [to_slab([x]) for x in st]
    rc_next = [oracle.RC[3 * 7 + i] for i in range(3)]
    rc_rows = [
        [int(v) for v in fr.int_to_digits(rc_next[i])] for i in range(3)
    ]
    got = [from_slab(x)[0] for x in fs.mds_rc_fused(slabs, rc_rows)]
    want = []
    for i in range(3):
        acc = 0
        for j in range(3):
            acc = oracle.add(acc, oracle.mul(oracle.MDS[3 * i + j], st[j]))
        want.append(oracle.add(acc, rc_next[i]))
    assert got == want


# ---------------------------------------------------------------------------
# Full kernels (interpret mode on CPU)
# ---------------------------------------------------------------------------

def test_pallas_permutation_golden():
    st = fr.ints_to_array([1, 2, 3]).reshape(1, 3, fr.NDIGITS)
    got = fr.array_to_ints(permutation_pallas(st)[0])
    assert got == oracle.permutation([1, 2, 3])


def test_pallas_hash_golden():
    x42 = fr.ints_to_array([42])
    assert fr.array_to_ints(hash_single_pallas(x42))[0] == oracle.hash_single(42)
    l = fr.ints_to_array([10])
    r = fr.ints_to_array([20])
    assert fr.array_to_ints(hash_pair_pallas(l, r))[0] == int(
        "0x2dd359f92d31c747e06c02b360a9f5c761777b285edcf09724efef5cbd51d9ba", 16
    )


def test_pallas_hash_pair_batch_vs_oracle():
    ls, rs = rand_reduced(32) + rand_full(8), rand_reduced(32) + rand_full(8)
    got = fr.array_to_ints(
        hash_pair_pallas(fr.ints_to_array(ls), fr.ints_to_array(rs))
    )
    assert got == [oracle.hash_pair(l, r) for l, r in zip(ls, rs)]


@pytest.mark.parametrize("n", [1, 3, 8])
def test_pallas_hash_multiple_vs_oracle(n):
    rows = [[rng.randrange(oracle.P) for _ in range(n)] for _ in range(8)]
    arr = np.stack([fr.ints_to_array(row) for row in rows])
    got = fr.array_to_ints(hash_multiple_pallas(arr))
    assert got == [oracle.hash_multiple(row) for row in rows]


def test_pallas_loop_hash_matches_repeated_application():
    """The device-side batch loop (chip-capability bench harness) is
    repeated hashing, bit-exactly: loop(x, n) == hash^n(x)."""
    from cuzk_tpu.ops import hash_pair_pallas_loop, hash_single_pallas_loop

    ls, rs = fr.ints_to_array(rand_reduced(4)), fr.ints_to_array(rand_reduced(4))
    got = fr.array_to_ints(hash_pair_pallas_loop(ls, rs, 3))
    want = [oracle.hash_pair(
        oracle.hash_pair(oracle.hash_pair(l, r), r), r)
        for l, r in zip(rand_ints(ls), rand_ints(rs))]
    assert got == want
    got_s = fr.array_to_ints(hash_single_pallas_loop(ls, 2))
    assert got_s == [
        oracle.hash_single(oracle.hash_single(x)) for x in rand_ints(ls)
    ]


def rand_ints(arr):
    return fr.array_to_ints(np.asarray(arr))


def test_pallas_matches_jnp_path():
    """Cross-implementation gate (the reference's
    verify_cuda_implementations_match, poseidon_cuda_benchmarks.cpp:137-259)."""
    ls, rs = fr.ints_to_array(rand_reduced(16)), fr.ints_to_array(rand_reduced(16))
    a = fr.array_to_ints(hash_pair_pallas(ls, rs))
    b = fr.array_to_ints(poseidon.hash_pair(ls, rs))
    assert a == b


def test_pallas_nonaligned_batch_sizes():
    for b in (1, 5, 130):
        xs = rand_reduced(b)
        got = fr.array_to_ints(hash_single_pallas(fr.ints_to_array(xs)))
        assert got == [oracle.hash_single(x) for x in xs]


def test_pallas_permutation_unreduced_states():
    """Public raw permutation on arbitrary canonical states must match the
    oracle bit-for-bit (round 0 uses the full wrap-at-2^256 add)."""
    states = [[rng.randrange(1 << 256) for _ in range(3)] for _ in range(4)]
    states.append([(1 << 256) - 1, (1 << 256) - oracle.RC[1], oracle.P])
    arr = np.stack([fr.ints_to_array(s) for s in states])
    got = fr.array_to_ints(permutation_pallas(arr).reshape(-1, fr.NDIGITS))
    want = []
    for s in states:
        want.extend(oracle.permutation(s))
    assert got == want


@pytest.mark.parametrize("arity", [2, 3, 5, 8])
def test_verify_body_level_walk(arity):
    """The fused verifier's level walk — current node inserted at its proof
    position, siblings clamped around it (merkle_tree.cpp:224-253) — checked
    against a direct numpy model, for both the kernel's static unroll and
    the fallback's fori_loop form.

    The 64-round sponge is substituted with a cheap position-sensitive
    stand-in via the ``sponge_body`` hook: compiling the real fused chain on
    XLA:CPU at -O0 takes ~45 min / tens of GB (docs/PERF.md), and the sponge
    itself is covered by the other differential tests here.  The full
    kernel-vs-batch-path differential runs on TPU hardware
    (test_fused_verify_vs_batch_verify_tpu below)."""
    import jax.numpy as jnp

    from cuzk_tpu.ops import poseidon_pallas as pp

    h, S, L = 3, 2, 8
    rng = np.random.default_rng(17 + arity)
    pos = rng.integers(0, arity, (h, S, L)).astype(np.int32)
    sib = rng.integers(0, 1 << 16, (h, arity - 1, 16, S, L)).astype(np.uint32)
    leaf = rng.integers(0, 1 << 16, (16, S, L)).astype(np.uint32)

    def fake_sponge(rc, get_input, n, ds, batch_shape):
        acc = jnp.zeros((16,) + tuple(batch_shape), jnp.uint32)
        for j in range(n):
            acc = (acc * 3 + get_input(j)) & 0xFFFF
        return acc

    # Direct numpy model of the walk: sibling j' = j - (j > p).
    want = leaf.copy()
    for lvl in range(h):
        acc = np.zeros((16, S, L), np.uint64)
        for j in range(arity):
            p = pos[lvl]
            # per-element sibling index j' = j - (j > p), clamped
            jp = np.clip(j - (j > p).astype(np.int64), 0, arity - 2)
            gathered = np.take_along_axis(
                sib[lvl], jp[None, None], axis=0
            )[0]
            child = np.where((j == p)[None], want, gathered)
            acc = (acc * 3 + child) & 0xFFFF
        want = acc.astype(np.uint32)

    for unroll in (True, False):
        got = np.asarray(
            pp._verify_body(
                None, jnp.asarray(pos), jnp.asarray(sib), jnp.asarray(leaf),
                arity, h, (S, L), unroll=unroll, sponge_body=fake_sponge,
            )
        )
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="fused verify kernel differential needs TPU (CPU O0 compile of "
    "the portable twin takes ~45 min; see docs/PERF.md)",
)
def test_fused_verify_vs_batch_verify_tpu():
    """On hardware: the fused verify kernel must agree with the per-level
    batched path AND the oracle on valid and tampered proofs
    (test_merkle_tree_cuda.cpp:520-620's role)."""
    import jax.numpy as jnp

    from cuzk_tpu import merkle
    from cuzk_tpu.ops.poseidon_pallas import verify_proofs_pallas

    leaves = merkle.generate_test_leaves(7, seed=5)
    tree = merkle.NaryMerkleTree(leaves, merkle.MerkleConfig(arity=2))
    idx = [0, 3, 6, 1, 5]
    pos, sib = tree.generate_batch_proofs(idx)
    proved = tree.levels[0][jnp.asarray(idx)]
    root = tree.get_root_hash()

    ok_fused = np.asarray(verify_proofs_pallas(pos, sib, proved, root, 2))
    assert ok_fused.shape == (len(idx),) and ok_fused.all()

    bad = np.asarray(proved).copy()
    bad[2, 0] ^= 1
    ok_fused = np.asarray(verify_proofs_pallas(pos, sib, bad, root, 2))
    assert list(ok_fused) == [True, True, False, True, True]
