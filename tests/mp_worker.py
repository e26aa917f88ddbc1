"""Worker for tests/test_multiprocess.py: one of N localhost CPU processes.

Each process initializes ``jax.distributed`` (the real multi-host entry
point, SURVEY.md §2.1's distributed backend), builds a GLOBAL mesh over all
processes' devices, runs the sharded Merkle build + sharded proof
generation, and checks both against the purely-local single-device build.
Run as: ``python mp_worker.py <port> <num_processes> <process_id>``.
"""

import os
import sys


def main() -> None:
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from cuzk_tpu.utils.compilecache import enable_compile_cache

    enable_compile_cache()

    from cuzk_tpu.parallel import distributed

    distributed.initialize_multiprocess(
        f"localhost:{port}", nproc, pid, local_device_count=2
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    from cuzk_tpu import merkle

    from cuzk_tpu.field import fr

    mesh = distributed.make_mesh()  # global: all processes' devices
    arity = 2
    rng = np.random.default_rng(5)
    # Same host value on every process (required by shard_batch).
    leaves = rng.integers(0, 1 << 16, (16, fr.NDIGITS), dtype=np.uint32)

    sharded, replicated = distributed.sharded_build_levels(leaves, arity, mesh)
    root = replicated[-1][0]
    got_root = np.asarray(root.addressable_data(0))

    # Purely process-local single-device build as the oracle.
    want_levels = merkle.build_tree_levels(jnp.asarray(leaves), arity)
    want_root = np.asarray(want_levels[-1][0])
    assert np.array_equal(got_root, want_root), (got_root, want_root)

    # Sharded proof generation across processes, checked bit-exactly.
    idx = np.array([0, 5, 15, 9], np.int32)
    pos, sib = distributed.sharded_generate_proofs(
        sharded, replicated, arity, idx, mesh
    )
    want_pos, want_sib = merkle.generate_proofs(want_levels, arity, idx)
    assert np.array_equal(
        np.asarray(pos.addressable_data(0)), np.asarray(want_pos)
    )
    assert np.array_equal(
        np.asarray(sib.addressable_data(0)), np.asarray(want_sib)
    )
    print(f"MP_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
