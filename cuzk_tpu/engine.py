"""Poseidon engine interface — the analog of ``IPoseidonCudaHash``
(cuda/poseidon_interface_cuda.hpp:27-47) with its two concrete
implementations (baseline CUDA / shared-memory-optimized CUDA ->
jnp reference path / fused Pallas kernel).

The reference's interface exists so benchmarks and the Merkle layer can swap
accelerators and cross-verify them; this mirrors that contract, including
``batch_permutation`` and the stats/batch-size introspection surface.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass

import jax.numpy as jnp

from cuzk_tpu import poseidon
from cuzk_tpu.utils.stats import HashingStats, timed


@dataclass
class PoseidonStats(HashingStats):
    """CudaPoseidonStats analog (poseidon_interface_cuda.hpp:15-21)."""

    batch_count: int = 0


class PoseidonEngine(abc.ABC):
    """Batched Poseidon accelerator interface (poseidon_interface_cuda.hpp)."""

    def __init__(self):
        self.stats = PoseidonStats()

    @abc.abstractmethod
    def batch_hash_single(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B,16] -> [B,16], ds=1."""

    @abc.abstractmethod
    def batch_hash_pairs(self, l: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
        """[B,16] x2 -> [B,16], ds=2."""

    @abc.abstractmethod
    def batch_hash_multiple(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """[B,n,16] -> [B,16], ds=3."""

    @abc.abstractmethod
    def batch_permutation(self, states: jnp.ndarray) -> jnp.ndarray:
        """[B,3,16] -> [B,3,16]."""

    def is_initialized(self) -> bool:
        return True

    def get_optimal_batch_size(self) -> int:
        """The reference clamps to device limits (poseidon_cuda.cu:235);
        on TPU larger batches amortize grid overhead up to HBM limits."""
        return 16384

    def get_max_batch_size(self) -> int:
        return 1 << 24

    def timed_hash_pairs(self, l, r):
        """Hash + record stats (the reference records per-call timings)."""
        out, sec = timed(self.batch_hash_pairs, l, r)
        self.stats.total_hashes += int(l.shape[0])
        self.stats.total_time_s += sec
        self.stats.batch_count += 1
        return out


class JnpPoseidonEngine(PoseidonEngine):
    """Reference path: batched jnp over digit-last arrays (the 'baseline'
    implementation slot, poseidon_cuda.cuh:23-59)."""

    def batch_hash_single(self, x):
        return poseidon.hash_single(x)

    def batch_hash_pairs(self, l, r):
        return poseidon.hash_pair(l, r)

    def batch_hash_multiple(self, inputs):
        return poseidon.hash_multiple(inputs)

    def batch_permutation(self, states):
        return poseidon.permutation(states)


class PallasPoseidonEngine(PoseidonEngine):
    """Accelerated path: fused digit-major Pallas kernel (the 'optimized'
    implementation slot, poseidon_cuda_optimized.cuh:26-62)."""

    def batch_hash_single(self, x):
        from cuzk_tpu.ops import hash_single_pallas

        return hash_single_pallas(x)

    def batch_hash_pairs(self, l, r):
        from cuzk_tpu.ops import hash_pair_pallas

        return hash_pair_pallas(l, r)

    def batch_hash_multiple(self, inputs):
        from cuzk_tpu.ops import hash_multiple_pallas

        return hash_multiple_pallas(inputs)

    def batch_permutation(self, states):
        from cuzk_tpu.ops import permutation_pallas

        return permutation_pallas(states)


def verify_engines_match(batch: int = 64, seed: int = 7) -> bool:
    """Cross-implementation verification gate
    (verify_cuda_implementations_match, poseidon_cuda_benchmarks.cpp:137-259):
    deterministic inputs, elementwise equality across engines."""
    import numpy as np

    rng = np.random.default_rng(seed)
    l = jnp.asarray(rng.integers(0, 1 << 16, (batch, 16), np.uint32))
    r = jnp.asarray(rng.integers(0, 1 << 16, (batch, 16), np.uint32))
    a, b = JnpPoseidonEngine(), PallasPoseidonEngine()
    import numpy as _np

    return (
        bool(_np.array_equal(a.batch_hash_pairs(l, r), b.batch_hash_pairs(l, r)))
        and bool(
            _np.array_equal(a.batch_hash_single(l), b.batch_hash_single(l))
        )
    )
