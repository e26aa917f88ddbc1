"""Fused Poseidon sponge/permutation Pallas TPU kernels.

The accelerated twin of :mod:`cuzk_tpu.poseidon` — the role the CUDA kernels
play in the reference (poseidon_cuda.cu:148-206, poseidon_cuda_optimized.cu),
re-designed for the TPU:

- ONE kernel fuses sponge init + all 64 rounds + squeeze; state lives in
  vector registers/VMEM for the whole permutation (the reference reloads
  RC/MDS from global memory every round in its baseline kernel and stages
  MDS via shared memory in its "optimized" one; here MDS coefficients are
  immediates and RC streams from SMEM as prefetched scalars — the TPU analog
  of ``cudaMemcpyToSymbol`` constants).
- Batch layout is digit-major ``[16, rows, 128]`` (see
  :mod:`cuzk_tpu.ops.fieldslab`): each grid step hashes a
  ``SUBLANE_TILE x 128`` tile of elements entirely on-chip; the grid streams
  tiles HBM->VMEM->HBM with no host round-trips (vs the reference's per-call
  cudaMalloc/H2D/D2H pipeline, poseidon_cuda.cu:279-471).
- Rounds run as three ``fori_loop`` phases (4 full / 56 partial / 4 full,
  poseidon.cpp:60-87) with round r+1's constant fused into round r's MDS
  reduce (bit-exact — fieldslab.mds_rc_fused) and round 0's standalone.
- The same round code doubles as a jitted pure-jnp slab program (arrays
  instead of refs) — the portable fallback path on non-TPU backends, and a
  second accelerated implementation to differential-test against (the analog
  of the reference's baseline/optimized CUDA pair,
  poseidon_cuda_benchmarks.cpp:137-259).

Bit-exact vs ``cuzk_tpu.oracle`` — verified by differential tests on CPU and
on hardware.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuzk_tpu import oracle
from cuzk_tpu.ops import fieldslab as fs

import os

ND = fs.NDIGITS
LANES = 128
# Rows per grid step (8 -> 1024 states/tile).  Env-tunable for perf sweeps.
SUBLANE_TILE = int(os.environ.get("CUZK_TILE_SUBLANES", "8"))

# Round constants as a [64, 3, 16] uint32 scalar table (poseidon.cpp:33-44).
RC_TABLE = np.array(
    [
        [fs._const_col(oracle.RC[oracle.T * r + i]).reshape(ND) for i in range(3)]
        for r in range(64)
    ],
    dtype=np.uint32,
)

HALF_FULL = oracle.FULL_ROUNDS // 2  # 4
PARTIAL = oracle.PARTIAL_ROUNDS  # 56
TOTAL = oracle.FULL_ROUNDS + PARTIAL  # 64


def _rc_row(rc, r, i):
    """One round constant as 16 scalar reads (r may be traced).  Works for
    both SMEM refs (in-kernel) and plain arrays (jnp fallback)."""
    return [rc[r, i, d] for d in range(ND)]


def _permute(s, rc, full_round0_add: bool = False):
    """The 64-round permutation on a list of 3 slabs.

    Round r's constant-add is fused into round r-1's MDS reduce
    (bit-exact — see fieldslab.mds_rc_fused); round 0's is standalone.

    ``full_round0_add``: the sponge always feeds REDUCED state (< p), where
    the single-subtract ``rc_add`` equals the oracle's wrapping add exactly.
    The public raw-permutation API may receive arbitrary canonical 256-bit
    state (like the reference's batch_permutation, poseidon_cuda.cu:184-206,
    whose cuda_add fully reduces) — it passes True to use the full
    wrap-at-2^256 + 4p/2p/p reduce on round 0's add.  Rounds 1+ always see
    reduced values, so the fast path is exact there regardless.
    """
    if full_round0_add:
        # Wrap-at-2^256 (dropped carry) + full 4p/2p/p reduce: the oracle's
        # add for ANY canonical 256-bit state.
        s = tuple(
            fs.red(fs.carry(fs.add_scalar_digits(s[i], _rc_row(rc, 0, i)))[0])
            for i in range(3)
        )
    else:
        s = tuple(fs.rc_add(s[i], _rc_row(rc, 0, i)) for i in range(3))

    # Three fori_loop phases, NOT one loop with a cond switch: Mosaic
    # predicates both cond branches, which was measured 3x slower end-to-end
    # (every partial round would pay the full S-box).
    def full_body(r, s):
        sb = [fs.power5(x) for x in s]
        nxt = [_rc_row(rc, r + 1, i) for i in range(3)]
        return tuple(fs.mds_rc_fused(sb, nxt))

    def partial_body(r, s):
        sb = [fs.power5(s[0]), s[1], s[2]]
        nxt = [_rc_row(rc, r + 1, i) for i in range(3)]
        return tuple(fs.mds_rc_fused(sb, nxt))

    s = jax.lax.fori_loop(0, HALF_FULL, full_body, s)
    s = jax.lax.fori_loop(HALF_FULL, HALF_FULL + PARTIAL, partial_body, s)
    s = jax.lax.fori_loop(HALF_FULL + PARTIAL, TOTAL - 1, full_body, s)
    # Final round: full S-box, no following constant.
    sb = [fs.power5(x) for x in s]
    return fs.mds_rc_fused(sb, None)


def _sponge_body(rc, get_input, n_inputs: int, ds: int, batch_shape):
    """Sponge semantics of poseidon.cpp:103-126 on slabs.

    ``get_input(i)`` yields the i-th absorbed element as a [16, *batch]
    slab; works over refs (kernel) or arrays (jnp fallback)."""
    zero = jnp.zeros((ND,) + tuple(batch_shape), jnp.uint32)
    ds_slab = jnp.concatenate(
        [jnp.full((1,) + tuple(batch_shape), np.uint32(ds)), zero[1:]], axis=0
    )
    s = [ds_slab, zero, zero]
    i = 0
    while i < n_inputs:
        for j in range(oracle.RATE):
            if i >= n_inputs:
                break
            # Absorb uses the full wrapping add (inputs may be >= p).
            s[1 + j] = fs.add_wrap_red(s[1 + j], get_input(i))
            i += 1
        s = list(_permute(s, rc))
    return s[1]


def _make_sponge_kernel(n_inputs: int, ds: int):
    """Pallas kernel: inputs [n, 16, S, L] -> state[1] digits [16, S, L]."""

    def kernel(rc_ref, in_ref, out_ref):
        with fs.const_cache(out_ref.shape[-2:]):
            out_ref[:] = _sponge_body(
                rc_ref, lambda i: in_ref[i], n_inputs, ds, out_ref.shape[-2:]
            )

    return kernel


def _permutation_kernel(rc_ref, in_ref, out_ref):
    """Raw batched permutation: [3, 16, S, L] -> [3, 16, S, L] (the analog of
    batch_permutation_kernel, poseidon_cuda.cu:184-206).  States may be any
    canonical 256-bit values, so round 0 uses the full oracle add."""
    with fs.const_cache(out_ref.shape[-2:]):
        s = [in_ref[i] for i in range(3)]
        s = _permute(s, rc_ref, full_round0_add=True)
        for i in range(3):
            out_ref[i] = s[i]


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _to_tiles(x: jnp.ndarray):
    """[B, k, 16] -> ([k, 16, R, 128], B, padded B): digit-major row tiles."""
    b = x.shape[0]
    tile = SUBLANE_TILE * LANES
    bp = max(tile, ((b + tile - 1) // tile) * tile)
    if bp > b:
        x = jnp.concatenate(
            [x, jnp.zeros((bp - b,) + x.shape[1:], jnp.uint32)], axis=0
        )
    xt = jnp.transpose(x, (1, 2, 0)).reshape(
        x.shape[1], ND, bp // LANES, LANES
    )
    return xt, b, bp


def _from_tiles(out: jnp.ndarray, b: int, bp: int) -> jnp.ndarray:
    """[16, R, 128] -> [B, 16]."""
    return out.reshape(ND, bp).T[:b]


@functools.partial(jax.jit, static_argnums=(1,))
def _sponge_pallas(inputs: jnp.ndarray, ds: int) -> jnp.ndarray:
    """Batched sponge over ``[B, n, 16]`` digit arrays (static n)."""
    b, n = inputs.shape[0], inputs.shape[1]
    if n == 0:
        # Empty input: no permutation, state[1] stays 0 (SURVEY.md B.4).
        return jnp.zeros((b, ND), jnp.uint32)
    xt, b, bp = _to_tiles(inputs)
    rows = bp // LANES
    if not _on_tpu():
        # Portable compiled path: same slab program over the whole batch.
        rc = jnp.asarray(RC_TABLE)
        with fs.const_cache((rows, LANES)):
            out = _sponge_body(rc, lambda i: xt[i], n, ds, (rows, LANES))
        return _from_tiles(out, b, bp)
    grid = (rows // SUBLANE_TILE,)
    out = pl.pallas_call(
        _make_sponge_kernel(n, ds),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (n, ND, SUBLANE_TILE, LANES),
                    lambda r, *_: (0, 0, r, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (ND, SUBLANE_TILE, LANES),
                lambda r, *_: (0, r, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((ND, rows, LANES), jnp.uint32),
    )(jnp.asarray(RC_TABLE), xt)
    return _from_tiles(out, b, bp)


@jax.jit
def hash_single_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Batched single-input hash, ds=1 (poseidon.cpp:89-91): [B,16]->[B,16]."""
    return _sponge_pallas(x[:, None, :], oracle.DS_SINGLE)


@jax.jit
def hash_pair_pallas(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Batched pair hash, ds=2 (poseidon.cpp:93-96)."""
    return _sponge_pallas(
        jnp.stack([left, right], axis=1), oracle.DS_PAIR
    )


@jax.jit
def hash_multiple_pallas(inputs: jnp.ndarray) -> jnp.ndarray:
    """Batched n-input hash, ds=3 (poseidon.cpp:98-101): [B,n,16]->[B,16]."""
    return _sponge_pallas(inputs, oracle.DS_MULTIPLE)


@jax.jit
def permutation_pallas(states: jnp.ndarray) -> jnp.ndarray:
    """Raw batched permutation on ``[B, 3, 16]`` states."""
    xt, b, bp = _to_tiles(states)  # [3, 16, R, 128]
    rows = bp // LANES
    if not _on_tpu():
        rc = jnp.asarray(RC_TABLE)
        with fs.const_cache((rows, LANES)):
            s = _permute([xt[i] for i in range(3)], rc, full_round0_add=True)
        out = jnp.stack(s, axis=0)
    else:
        grid = (rows // SUBLANE_TILE,)
        out = pl.pallas_call(
            _permutation_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (3, ND, SUBLANE_TILE, LANES),
                        lambda r, *_: (0, 0, r, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (3, ND, SUBLANE_TILE, LANES),
                    lambda r, *_: (0, 0, r, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((3, ND, rows, LANES), jnp.uint32),
        )(jnp.asarray(RC_TABLE), xt)
    # [3, 16, R, 128] -> [B, 3, 16]
    res = out.reshape(3, ND, bp).transpose(2, 0, 1)
    return res[:b]
