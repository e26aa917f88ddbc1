"""Golden-vector tests for the exact Python-int oracle.

All expected values come from SURVEY.md Appendix A and were produced by
compiling and running the reference CPU sources — they are the bit-exactness
contract for the whole framework.
"""

import pytest

from cuzk_tpu import oracle


def test_modulus_and_k():
    assert oracle.P == int(
        "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001", 16
    )
    assert oracle.K == int(
        "0x0e0a77c19a07df2f666ea36f7879462e36fc76959f60cd29ac96341c4ffffffb", 16
    )


def test_round_constants_golden():
    assert oracle.RC[0] == 0x123456789ABCDEF
    assert oracle.RC[191] == 0xDA7414C3456788DF
    assert len(oracle.RC) == 192


def test_permutation_golden():
    st = oracle.permutation([1, 2, 3])
    assert st[0] == int(
        "0x07b845866686a60a43f75f0cd778887cc9c304376fcd0b3de6964e45b9630501", 16
    )
    assert st[1] == int(
        "0x0ef091199adbccb5a4f16d125495a5088efad30e7157b84e7429c087d234c932", 16
    )
    assert st[2] == int(
        "0x157a12c9c56ae74429660dfb6aebdf9148e6afb977080be9c424ccb07472ae04", 16
    )


def test_hash_golden():
    assert oracle.hash_single(42) == int(
        "0x066e59aed12901e110f7d8459d3c2fa7705b3ce5a5eb1c7593e7e1465f85dafb", 16
    )
    assert oracle.hash_pair(10, 20) == int(
        "0x2dd359f92d31c747e06c02b360a9f5c761777b285edcf09724efef5cbd51d9ba", 16
    )
    assert oracle.hash_pair(42, 0) == int(
        "0x0f6e1adbcd1de3d6161cd9cfc7dad8c98d9acedc903b3e94c2cc8df4c3001580", 16
    )
    assert oracle.hash_multiple([1, 2, 3, 4]) == int(
        "0x2c12b96d3926e4862876ae9ca67cddad85313fa6fa5f266fb7ab683826a6a497", 16
    )
    assert oracle.hash_multiple([]) == 0


def test_empty_hash_golden():
    assert oracle.empty_hash(2) == int(
        "0x194324f01efa21d2dcdd7453800fde166a852e2906e0e6de5de6921eeb77feec", 16
    )
    assert oracle.empty_hash(4) == int(
        "0x1c7842d7703c243a99d6e6ca4033851791b5ae206220fc8c9bcdde10e5befbdd", 16
    )
    assert oracle.empty_hash(8) == int(
        "0x2ca165c9c68473c20eb293f63de5986e10a90fb68f6e54bd7932e5166048445d", 16
    )


def test_merkle_root_golden():
    assert oracle.merkle_root([1, 2], 2) == int(
        "0x28c245bfd4d7a4d1ee6ba330337adc309f013d29c9326c28ba0d3cb47027fca6", 16
    )
    assert oracle.merkle_root([1, 2, 3, 4], 2) == int(
        "0x236b917229eeea3ee41c637a7c3cc01f727ac1dc5108c962f564acc1d8730e44", 16
    )
    assert oracle.merkle_root([1, 2, 3, 4, 5], 3) == int(
        "0x28b819c1eb91377e70ed6e8bbb4c526b9b7ababafdcb021e135791fc4f3e25aa", 16
    )


def test_mul_truncation_golden():
    a = int(
        "0x123456789abcdef0fedcba987654321011112222333344445555666677778888", 16
    )
    b = int(
        "0x0fedcba987654321123456789abcdef0aaaabbbbccccddddeeeeffff00001111", 16
    )
    got = oracle.mul(a, b)
    assert got == int(
        "0x19f690df510f402ffef3bf6bfc5f36bf54cac399b184b355725667a3eefc6378", 16
    )
    # The oracle deliberately deviates from true modular multiplication
    # (SURVEY.md Appendix A/B) — pin the deviation so a "fix" cannot slip in.
    assert got != (a * b) % oracle.P


def test_merkle_proof_roundtrip():
    leaves = [1, 2, 3, 4]
    levels = oracle.build_tree_levels(leaves, 2)
    root = levels[-1][0]
    assert oracle.tree_height(4, 2) == 3
    indices, path = oracle.generate_proof(levels, 2, 2)
    assert len(path) == 2  # proof(leaf 2) has 2 levels (Appendix A)
    assert oracle.verify_proof(indices, path, 3, root, 2)
    assert not oracle.verify_proof(indices, path, 99, root, 2)
    # Tamper with a sibling: must fail.
    bad_path = [list(lvl) for lvl in path]
    bad_path[0][0] ^= 1
    assert not oracle.verify_proof(indices, bad_path, 3, root, 2)


@pytest.mark.parametrize("arity", range(2, 9))
def test_merkle_all_arities_roundtrip(arity):
    leaves = oracle.generate_test_leaves(arity**2 + 3)
    levels = oracle.build_tree_levels(leaves, arity)
    root = levels[-1][0]
    for idx in (0, len(leaves) - 1, len(leaves) // 2):
        indices, path = oracle.generate_proof(levels, arity, idx)
        assert oracle.verify_proof(indices, path, leaves[idx], root, arity)


def test_field_properties():
    import random

    rng = random.Random(0)
    for _ in range(50):
        a = rng.randrange(oracle.P)
        b = rng.randrange(oracle.P)
        assert oracle.add(a, b) == (a + b) % oracle.P  # exact for reduced inputs
        assert oracle.sub(a, b) == (a - b) % oracle.P
        assert oracle.add(a, 0) == a
        assert oracle.mul(a, 1) == a
        assert oracle.mul(a, 0) == 0
        assert oracle.sub(oracle.add(a, b), b) == a
        assert oracle.mul(a, b) == oracle.mul(b, a)
        assert oracle.mul(a, b) < oracle.P


def test_mt19937_64_matches_cpp():
    # std::mt19937_64 seeded with 5489 produces 9981545732273789042 first
    # (the standard's own reference value at the 10000th draw is also pinned).
    gen = oracle._MT19937_64(5489)
    assert gen.next() == 14514284786278117030
    gen2 = oracle._MT19937_64(5489)
    vals = [gen2.next() for _ in range(10000)]
    assert vals[9999] == 9981545732273789042
