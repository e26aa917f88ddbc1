"""Sharded build/hash tests on the 8-virtual-device CPU mesh.

The multi-device analog of the reference's CPU-vs-GPU consistency tests
(test_merkle_tree_cuda.cpp:82-171): the sharded program must agree
bit-exactly with the single-device build on every topology.
"""

import random

import numpy as np
import pytest
import jax

from cuzk_tpu import merkle, oracle, poseidon
from cuzk_tpu.field import fr
from cuzk_tpu.parallel import distributed

rng = random.Random(99)


def rand_leaves(n):
    return fr.ints_to_array([rng.randrange(oracle.P) for _ in range(n)])


def test_mesh_has_8_devices():
    mesh = distributed.make_mesh()
    assert mesh.shape[distributed.DATA_AXIS] == 8


def test_sharded_hash_pairs_matches_local():
    mesh = distributed.make_mesh()
    l, r = rand_leaves(32), rand_leaves(32)
    got = distributed.sharded_hash_pairs(l, r, mesh)
    want = poseidon.hash_pair(np.asarray(l), np.asarray(r))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# One sharded level per (mesh, arity) combo: every extra local level is
# another ~8 s XLA:CPU shard_map compile, and the multi-level local build is
# covered by test_sharded_levels_concatenate_to_full_tree below.
@pytest.mark.parametrize("arity,count,ndev", [(2, 16, 8), (4, 16, 4), (8, 64, 8)])
def test_sharded_root_matches_single_device(arity, count, ndev):
    mesh = distributed.make_mesh(ndev)
    leaves = rand_leaves(count)
    root = distributed.sharded_merkle_root(leaves, arity, mesh)
    want = merkle.merkle_root(leaves, arity)
    np.testing.assert_array_equal(np.asarray(root), np.asarray(want))


def test_sharded_levels_concatenate_to_full_tree():
    mesh = distributed.make_mesh(4)
    arity, count = 2, 32
    leaves = rand_leaves(count)
    sharded, replicated = distributed.sharded_build_levels(leaves, arity, mesh)
    full = merkle.build_tree_levels(leaves, arity)
    # replicated[0] is the gathered version of sharded[-1]
    combined = [np.asarray(lv) for lv in sharded[:-1]] + [
        np.asarray(lv) for lv in replicated
    ]
    assert len(combined) == len(full)
    for got, want in zip(combined, full):
        np.testing.assert_array_equal(got, np.asarray(want))


def test_sharded_proofs_match_single_device():
    # Same mesh/arity/size combo as the concatenate test so the sharded
    # build programs are shared; only the tiny sparse-extract program is
    # new.  Proofs must be bit-identical to the single-device generator.
    mesh = distributed.make_mesh(4)
    arity, count = 2, 32
    leaves = rand_leaves(count)
    sharded, replicated = distributed.sharded_build_levels(leaves, arity, mesh)
    idx = np.array([0, 3, 7, 12, 31, 31, 17], np.int32)
    pos, sib = distributed.sharded_generate_proofs(
        sharded, replicated, arity, idx, mesh
    )
    levels = merkle.build_tree_levels(leaves, arity)
    want_pos, want_sib = merkle.generate_proofs(levels, arity, idx)
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(want_pos))
    np.testing.assert_array_equal(np.asarray(sib), np.asarray(want_sib))
    # And the proofs verify against the root.
    root = replicated[-1][0]
    ok = merkle.verify_proofs(pos, sib, levels[0][idx], root, arity)
    assert bool(np.asarray(ok).all())


def test_sharded_degenerate_fallback():
    # 4 leaves on 8 devices: m % d != 0 -> replicated fallback, same root.
    mesh = distributed.make_mesh(8)
    leaves = rand_leaves(4)
    root = distributed.sharded_merkle_root(leaves, 2, mesh)
    want = merkle.merkle_root(leaves, 2)
    np.testing.assert_array_equal(np.asarray(root), np.asarray(want))


def test_level_cache_keys_on_mesh_identity_not_id():
    """Round-2 regression: _LEVEL_CACHE keyed on id(mesh), so a new Mesh at
    a GC'd Mesh's address could hit a stale executable for the wrong mesh.
    Keys must be value-based: equal meshes share an entry, different
    meshes never collide."""
    mesh4a = distributed.make_mesh(4)
    fn4 = distributed._shmap_hash(mesh4a, distributed.DATA_AXIS, "single")
    mesh4b = distributed.make_mesh(4)  # equal identity, different object
    assert (
        distributed._shmap_hash(mesh4b, distributed.DATA_AXIS, "single")
        is fn4
    )
    mesh8 = distributed.make_mesh(8)
    assert (
        distributed._shmap_hash(mesh8, distributed.DATA_AXIS, "single")
        is not fn4
    )
    assert distributed._mesh_key(mesh4a) == distributed._mesh_key(mesh4b)
    assert distributed._mesh_key(mesh4a) != distributed._mesh_key(mesh8)


def test_shard_batch_casts_device_arrays_to_uint32():
    """shard_batch must normalize dtype for jax.Array inputs too (advisor
    finding, round 2): an int32/uint64 device array fed to the public
    sharded hash entry points has to reach the kernels as uint32."""
    import jax.numpy as jnp

    mesh = distributed.make_mesh(4)
    vals = [rng.randrange(oracle.P) for _ in range(8)]
    host = np.asarray(fr.ints_to_array(vals))
    dev_i32 = jnp.asarray(host.astype(np.int64)).astype(jnp.int32)
    out = distributed.shard_batch(dev_i32, mesh)
    assert out.dtype == jnp.uint32
    np.testing.assert_array_equal(np.asarray(out), host)
    got = distributed.sharded_hash_single(dev_i32, mesh)
    want = poseidon.hash_single(jnp.asarray(host))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mesh_key_distinguishes_grid_shapes():
    """Two meshes over the same devices with the same axis names but
    different grid shapes partition differently and must not share cache
    entries (round-3 review finding)."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4])
    m22 = Mesh(devs.reshape(2, 2), ("data", "model"))
    m41 = Mesh(devs.reshape(4, 1), ("data", "model"))
    assert distributed._mesh_key(m22) != distributed._mesh_key(m41)
