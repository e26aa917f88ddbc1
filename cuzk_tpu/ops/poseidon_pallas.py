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
from cuzk_tpu.field import fr
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


def _sponge_body_dyn(rc, inputs, n, ds, batch_shape):
    """Width-dynamic sponge on slabs: ``inputs [W, 16, *batch]`` zero-padded
    to even static W, true count ``n`` and domain separator ``ds`` as
    runtime scalars.  ceil(n/2) dynamic absorb blocks; absorbing a padded
    zero is bit-exactly a no-op (add(x, 0) == x for the reduced state).
    One executable per batch bucket serves every width <= W and every ds."""
    zero = jnp.zeros((ND,) + tuple(batch_shape), jnp.uint32)
    ds_slab = jnp.concatenate(
        [jnp.full((1,) + tuple(batch_shape), ds.astype(jnp.uint32)), zero[1:]],
        axis=0,
    )

    w = inputs.shape[0]

    def pick(idx):
        # Mosaic has no dynamic_slice on values: a select chain over the
        # <= 8 static input slots (~100 vector ops, noise next to the
        # permutation) picks the absorbed element.
        out = inputs[0]
        for j in range(1, w):
            out = jnp.where(idx == j, inputs[j], out)
        return out

    def block(bi, s):
        s0, s1, s2 = s
        i0 = 2 * bi
        s1 = fs.add_wrap_red(s1, pick(i0))
        s2 = fs.add_wrap_red(s2, pick(i0 + 1))
        return tuple(_permute([s0, s1, s2], rc))

    n_blocks = (n.astype(jnp.int32) + 1) // 2
    s = jax.lax.fori_loop(0, n_blocks, block, (ds_slab, zero, zero))
    return s[1]


def _sponge_kernel_dyn(rc_ref, sc_ref, in_ref, out_ref):
    """Pallas kernel: inputs [W, 16, S, L] -> state[1] digits [16, S, L].

    ``sc_ref``: [n_active_tiles, n_inputs, ds] runtime scalars.  Grid
    lengths are power-of-two bucketed (one executable per bucket, see
    ``_bucket_tiles``); tiles past ``sc_ref[0]`` hold only padding and skip
    the permutation entirely — bucketing costs compile reuse, not compute."""

    @pl.when(pl.program_id(0) < sc_ref[0])
    def _():
        with fs.const_cache(out_ref.shape[-2:]):
            out_ref[:] = _sponge_body_dyn(
                rc_ref, in_ref[:], sc_ref[1], sc_ref[2], out_ref.shape[-2:]
            )


def _permutation_kernel(rc_ref, nt_ref, in_ref, out_ref):
    """Raw batched permutation: [3, 16, S, L] -> [3, 16, S, L] (the analog of
    batch_permutation_kernel, poseidon_cuda.cu:184-206).  States may be any
    canonical 256-bit values, so round 0 uses the full oracle add."""
    @pl.when(pl.program_id(0) < nt_ref[0])
    def _():
        with fs.const_cache(out_ref.shape[-2:]):
            s = [in_ref[i] for i in range(3)]
            s = _permute(s, rc_ref, full_round0_add=True)
            for i in range(3):
                out_ref[i] = s[i]


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def poseidon_mod():
    """Lazy import of the element-major jnp twin (function-local to keep the
    module import graph acyclic for tooling; Python caches it)."""
    from cuzk_tpu import poseidon

    return poseidon


def _bucket_tiles(n_tiles: int) -> int:
    """Grid-length bucket for a requested tile count: exact up to 8 tiles,
    power-of-two above.  Every distinct grid length is its own compiled
    executable (minutes each over a tunneled backend); this bounds the set to
    8 + log2 entries while keeping small-batch padding waste at zero and
    large-batch waste amortized (e.g. a 5K-proof verify runs 5 tiles, not 8 —
    the pure-power-of-two policy cost 60% extra kernel time there)."""
    if n_tiles <= 8:
        return n_tiles
    return 1 << (n_tiles - 1).bit_length()


# ---------------------------------------------------------------------------
# Fused batch proof verification — ONE kernel walks every proof level with
# the running digest resident in VMEM (the TPU analog of
# batch_verify_proofs_kernel, merkle_tree_cuda.cu:67-118; the per-level
# host-driven alternative spends more time re-tiling between levels than
# hashing).
# ---------------------------------------------------------------------------

def _verify_body(rc, pos, sib, leaf, arity: int, height: int, batch_shape,
                 unroll: bool = True, sponge_body=None):
    """Root recomputation for one proof tile: ``pos [h, S, L]``, ``sib
    [h, a-1, 16, S, L]``, ``leaf [16, S, L]`` -> digits ``[16, S, L]``.

    Shared between the Pallas kernel and the portable jnp fallback — indexing
    ``pos``/``sib`` works over refs and arrays alike.  Per level: the
    child-group build (current node at its proof position, siblings around
    it — merkle_tree.cpp:224-253) feeds the sponge directly.

    ``unroll``: the Mosaic kernel statically unrolls the level walk (refs
    cannot be indexed by traced values; Mosaic compiles the unroll fast).
    False wraps the walk in a fori_loop instead (exercised by the level-walk
    unit test; the production non-TPU path in :func:`_verify_tiles` uses the
    element-major jnp program rather than this slab form, whose XLA:CPU
    compile takes tens of minutes).

    ``sponge_body``: test hook — tests/test_pallas.py substitutes a cheap
    stand-in to exercise the level-walk/sibling-select logic without paying
    a 64-round-permutation compile on the CPU backend (the full composition
    is differentially tested on TPU hardware, where Mosaic compiles fast)."""
    if sponge_body is None:
        sponge_body = _sponge_body

    def level(lvl, cur):
        p = pos[lvl]

        def get_input(j, _p=p, _sib=sib[lvl], _cur=cur):
            below = _sib[min(j, arity - 2)]
            above = _sib[max(j - 1, 0)]
            cand = jnp.where((jnp.int32(j) > _p)[None], above, below)
            return jnp.where((jnp.int32(j) == _p)[None], _cur, cand)

        return sponge_body(rc, get_input, arity, oracle.DS_MULTIPLE,
                           batch_shape)

    if unroll:
        cur = leaf
        for lvl in range(height):
            cur = level(lvl, cur)
        return cur
    return jax.lax.fori_loop(0, height, level, leaf)


def _make_verify_kernel(arity: int, height: int):
    """Kernel: (rc, nt, pos [h,S,L], sibs [h,a-1,16,S,L], leaf [16,S,L]) ->
    recomputed root digits [16, S, L]."""

    def kernel(rc_ref, nt_ref, pos_ref, sib_ref, leaf_ref, out_ref):
        @pl.when(pl.program_id(0) < nt_ref[0])
        def _():
            with fs.const_cache(out_ref.shape[-2:]):
                out_ref[:] = _verify_body(
                    rc_ref, pos_ref, sib_ref, leaf_ref[:], arity, height,
                    out_ref.shape[-2:],
                )

    return kernel


def _verify_elementwise(pos_e, sib_e, leaf_e, arity: int, height: int):
    """Portable verification walk on ELEMENT-MAJOR proofs: ``pos_e [B, h]``,
    ``sib_e [B, h, a-1, 16]``, ``leaf_e [B, 16]`` -> recomputed roots
    ``[B, 16]``.  The scanned jnp twin of the fused kernel's level walk —
    bit-identical (fieldslab ops are per-op differentially tested on CPU;
    the kernel composition is differentially tested on TPU).  The slab form
    of this walk compiles to a ~100k-op HLO program that XLA:CPU chews on
    for tens of minutes, hence this twin."""
    from cuzk_tpu import poseidon

    jcol = jnp.arange(arity, dtype=jnp.int32)

    def level(lvl, cur):
        p = jax.lax.dynamic_index_in_dim(
            pos_e, lvl, axis=1, keepdims=False
        )  # [B]
        sib_l = jax.lax.dynamic_index_in_dim(
            sib_e, lvl, axis=1, keepdims=False
        )  # [B, a-1, 16]
        # Child group: current node at its proof position, siblings
        # j' = j - (j > p) around it (merkle_tree.cpp:224-253).
        jp = jnp.clip(
            jcol[None, :] - (jcol[None, :] > p[:, None]), 0, arity - 2
        )
        gathered = jnp.take_along_axis(sib_l, jp[..., None], axis=1)
        group = jnp.where(
            (jcol[None, :] == p[:, None])[..., None],
            cur[:, None, :],
            gathered,
        )  # [B, a, 16]
        if arity < PAD_WIDTH:
            # Pad to the shared width bucket (absorbing a padded zero is
            # bit-exactly a no-op and the absorb loop's trip count is
            # runtime-n, so padding costs nothing): all arities reuse
            # one _sponge_dyn executable per batch size.
            group = jnp.pad(group, ((0, 0), (0, PAD_WIDTH - arity), (0, 0)))
        return poseidon._sponge_dyn(
            group, jnp.int32(arity), jnp.int32(oracle.DS_MULTIPLE)
        )

    return jax.lax.fori_loop(0, height, level, leaf_e)  # [B, 16]


@functools.partial(jax.jit, static_argnums=(5, 6))
def _verify_chain(positions, siblings, leaves, root, n_active, arity: int,
                  height: int):
    """Fused tile->kernel->untile->compare verification chain on
    BUCKET-PADDED element-major proofs: ``positions [BP, h]``, ``siblings
    [BP, h, a-1, 16]``, ``leaves [BP, 16]``, ``root [16]`` -> validity
    ``[BP] bool``.  The root comparison lives INSIDE this (bucketed, reused)
    executable so the whole verification is ONE dispatch — over tunneled
    backends each dependent dispatch hop costs ~10-20 ms (docs/PERF.md).

    Off-TPU the element-major walk runs directly — no lane tiling, so the
    batch bucket is small (see ``_tile_elems``) and the executables (and
    their minutes-scale XLA:CPU compiles) are shared with the jnp path."""
    bp, h = positions.shape
    if not _on_tpu():
        out = _verify_elementwise(positions, siblings, leaves, arity, h)
        return jnp.all(out == root[None, :], axis=-1)
    rows = bp // LANES
    pos_t = positions.T.reshape(h, rows, LANES)
    sib_t = jnp.transpose(siblings, (1, 2, 3, 0)).reshape(
        h, arity - 1, ND, rows, LANES
    )
    leaf_t = jnp.transpose(leaves, (1, 0)).reshape(ND, rows, LANES)
    out = _verify_tiles(pos_t, sib_t, leaf_t, n_active, arity, height)
    # out element e lives at (row e // 128, lane e % 128): the [rows, LANES]
    # comparison reshapes to [BP] in the same order as .reshape(ND, bp).T.
    ok = jnp.all(out == root[:, None, None], axis=0)
    return ok.reshape(bp)


def _verify_tiles(pos_t, sib_t, leaf_t, n_active, arity: int, height: int):
    """Fused verification kernel call over pre-tiled proof tensors (rows
    bucketed, ``n_active`` dynamic)."""
    rows = leaf_t.shape[1]
    if not _on_tpu():
        # Portable path (only reachable when called with pre-tiled tensors
        # off-TPU; the production off-TPU route is _verify_chain ->
        # _verify_elementwise with no tiling at all).
        b = rows * LANES
        pos_e = pos_t.reshape(height, b).T  # [B, h]
        sib_e = jnp.transpose(
            sib_t.reshape(height, arity - 1, ND, b), (3, 0, 1, 2)
        )  # [B, h, a-1, 16]
        leaf_e = leaf_t.reshape(ND, b).T  # [B, 16]
        out = _verify_elementwise(pos_e, sib_e, leaf_e, arity, height)
        return out.T.reshape(ND, rows, LANES)
    grid = (rows // SUBLANE_TILE,)
    return pl.pallas_call(
        _make_verify_kernel(arity, height),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (height, SUBLANE_TILE, LANES),
                    lambda r, *_: (0, r, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (height, arity - 1, ND, SUBLANE_TILE, LANES),
                    lambda r, *_: (0, 0, 0, r, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ND, SUBLANE_TILE, LANES),
                    lambda r, *_: (0, r, 0),
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
    )(jnp.asarray(RC_TABLE), n_active, pos_t, sib_t, leaf_t)


@functools.partial(jax.jit, static_argnums=(3,))
def _pad_proofs(positions, siblings, leaves, bp: int):
    """One jitted program padding all three proof tensors to the bucket size
    — a single dispatch instead of three eager pads."""
    pad = bp - positions.shape[0]
    return (
        jnp.pad(positions, ((0, pad), (0, 0))),
        jnp.pad(siblings, ((0, pad),) + ((0, 0),) * (siblings.ndim - 1)),
        jnp.pad(leaves, ((0, pad), (0, 0))),
    )


def verify_proofs_pallas(positions, siblings, leaves, root, arity: int):
    """Fused batch Merkle-proof verification on TPU.

    ``positions [k, h] int32``, ``siblings [k, h, a-1, 16]``,
    ``leaves [k, 16]``, ``root [16]`` -> ``[k] bool``.

    When ``k`` is already bucket-aligned (a power-of-two multiple of the
    1024-element tile) the whole verification — tiling, kernel, root compare
    — is ONE device dispatch; otherwise one pad dispatch and one trailing
    slice are added.  Padded entries recompute garbage roots and report
    False, then are sliced away.
    """
    positions = jnp.asarray(positions, jnp.int32)
    siblings = jnp.asarray(siblings, jnp.uint32)
    leaves = jnp.asarray(leaves, jnp.uint32)
    root = jnp.asarray(root, jnp.uint32)
    k, h = positions.shape
    if h == 0:
        return jnp.all(leaves == root[None, :], axis=-1)
    tile = _tile_elems()
    n_tiles = max(1, -(-k // tile))
    bp = _bucket_tiles(n_tiles) * tile
    if bp != k:
        positions, siblings, leaves = _pad_proofs(
            positions, siblings, leaves, bp
        )
    ok = _verify_chain(
        positions, siblings, leaves, root,
        _scalars((k + tile - 1) // tile), arity, h,
    )
    return ok if bp == k else ok[:k]


# Width padding bound shared with the jnp path: all widths <= 8 share one
# kernel executable per batch bucket.
PAD_WIDTH = 8


@jax.jit
def _sponge_tiles(xt: jnp.ndarray, scalars: jnp.ndarray):
    """Jitted width-dynamic sponge over PRE-TILED ``[W, 16, rows, 128]``
    input; ``scalars = [n_active_tiles, n_inputs, ds]`` (all runtime).

    ``rows`` is power-of-two bucketed by the caller, so this (expensive to
    compile) executable is reused across all batch sizes in a bucket and
    every hash width/domain — neither the exact batch size nor the width
    appears in the program."""
    rows = xt.shape[2]
    if not _on_tpu():
        # Portable path: the scanned element-major jnp sponge (bit-identical;
        # see _verify_tiles on why the slab form is not compiled on CPU).
        from cuzk_tpu import poseidon

        w = xt.shape[0]
        flat = jnp.transpose(xt.reshape(w, ND, rows * LANES), (2, 0, 1))
        out = poseidon._sponge_dyn(flat, scalars[1], scalars[2])  # [B, 16]
        return out.T.reshape(ND, rows, LANES)
    grid = (rows // SUBLANE_TILE,)
    w = xt.shape[0]
    return pl.pallas_call(
        _sponge_kernel_dyn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (w, ND, SUBLANE_TILE, LANES),
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
    )(jnp.asarray(RC_TABLE), scalars, xt)


# Device-resident scalar tuples, cached: a fresh host array per call would
# cost one host->device transfer per hash call (measured ~10ms per small
# call over a tunneled backend).
_SCALAR_CACHE = {}


def _scalars(*vals) -> jnp.ndarray:
    key = tuple(int(v) for v in vals)
    arr = _SCALAR_CACHE.get(key)
    if arr is None:
        arr = jnp.asarray(key, jnp.int32)
        # Under an enclosing jit trace (e.g. the fused tree build) asarray
        # yields a staged-constant TRACER — caching it would leak it into
        # later traces/eager calls.  Cache only concrete device arrays.
        if not isinstance(arr, jax.core.Tracer):
            _SCALAR_CACHE[key] = arr
    return arr


@jax.jit
def _sponge_chain(padded: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """Full width-pad->tile->kernel->untile chain on BUCKET-PADDED
    ``[BP, n, 16]`` input (n = RAW hash width): one executable per
    (batch bucket, width), ONE dispatch per call.  The width pad lives
    INSIDE this program — as a separate eager op it made every hash call a
    2-hop dependent chain, and dependent hops cost ~5-20 ms each over
    tunneled backends (measured 9.8 ms/call -> the reference's batch-4096
    config ran at 0.19x baseline; chain length, not op cost, dominates
    small-batch latency).  The padded width never reaches the kernel
    executable key: all widths <= 8 share one kernel per batch bucket."""
    bp, n = padded.shape[0], padded.shape[1]
    w = max(PAD_WIDTH, n + (n & 1))
    if w != n:
        padded = jnp.pad(padded, ((0, 0), (0, w - n), (0, 0)))
    xt = jnp.transpose(padded, (1, 2, 0)).reshape(w, ND, bp // LANES, LANES)
    out = _sponge_tiles(xt, scalars)
    return out.reshape(ND, bp).T


def _sponge_pallas(inputs: jnp.ndarray, ds: int) -> jnp.ndarray:
    """Batched sponge over ``[B, n, 16]`` digit arrays.

    Python-level wrapper: pads the batch to its bucket (one tiny eager op,
    only when misaligned), runs the fused one-dispatch chain, slices.

    Off-TPU this routes straight to the element-major jnp sponge — the
    bit-identical portable twin — so both paths share one set of compiled
    (bucket, width) executables: XLA:CPU compiles of the sponge cost ~10 s
    each, and the test suite exercises both APIs on every bucket."""
    inputs = jnp.asarray(inputs, jnp.uint32)
    b, n = inputs.shape[0], inputs.shape[1]
    if n == 0:
        # Empty input: no permutation, state[1] stays 0 (SURVEY.md B.4).
        return jnp.zeros((b, ND), jnp.uint32)
    if not _on_tpu():
        return poseidon_mod()._sponge_bucketed(inputs, ds)
    bp, active = _bucket_batch(b)
    if bp != b:
        inputs = jnp.pad(inputs, ((0, bp - b), (0, 0), (0, 0)))
    out = _sponge_chain(inputs, _scalars(active, n, ds))
    return out if bp == b else out[:b]


@jax.jit
def _single_chain(x: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """hash_single's whole device program: reshape + width-pad + tile +
    kernel + untile in ONE dispatch (jit-of-jit inlines _sponge_chain)."""
    return _sponge_chain(x[:, None, :], scalars)


@jax.jit
def _pair_chain(l: jnp.ndarray, r: jnp.ndarray, scalars: jnp.ndarray):
    """hash_pair's whole device program: the operand stack lives INSIDE the
    jit — as a separate eager op it made every call a 2-hop dependent chain
    (~5-20 ms/hop over tunneled backends; measured +105 ns/hash at batch
    4096)."""
    return _sponge_chain(jnp.stack([l, r], axis=1), scalars)


def _tile_elems() -> int:
    """Elements per grid tile: a full sublane x lane tile on TPU; 8 off-TPU,
    where there is no lane tiling and padding every call to 1024 elements
    cost a 128x runtime overhead in the CPU-backend test suite."""
    return SUBLANE_TILE * LANES if _on_tpu() else 8


def _bucket_batch(b: int):
    """(padded batch, active tiles) for a raw batch size."""
    tile = _tile_elems()
    n_tiles = max(1, -(-b // tile))
    return _bucket_tiles(n_tiles) * tile, (b + tile - 1) // tile


def hash_single_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Batched single-input hash, ds=1 (poseidon.cpp:89-91): [B,16]->[B,16].
    Off-TPU: the element-major jnp twin (see :func:`_sponge_pallas`)."""
    x = jnp.asarray(x, jnp.uint32)
    if not _on_tpu():
        return poseidon_mod().hash_single(x)
    b = x.shape[0]
    bp, active = _bucket_batch(b)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    out = _single_chain(x, _scalars(active, 1, oracle.DS_SINGLE))
    return out if bp == b else out[:b]


def hash_pair_pallas(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Batched pair hash, ds=2 (poseidon.cpp:93-96).
    Off-TPU: the element-major jnp twin (see :func:`_sponge_pallas`)."""
    l = jnp.asarray(left, jnp.uint32)
    r = jnp.asarray(right, jnp.uint32)
    if not _on_tpu():
        return poseidon_mod().hash_pair(l, r)
    b = l.shape[0]
    bp, active = _bucket_batch(b)
    if bp != b:
        l = jnp.pad(l, ((0, bp - b), (0, 0)))
        r = jnp.pad(r, ((0, bp - b), (0, 0)))
    out = _pair_chain(l, r, _scalars(active, 2, oracle.DS_PAIR))
    return out if bp == b else out[:b]


def hash_multiple_pallas(inputs: jnp.ndarray) -> jnp.ndarray:
    """Batched n-input hash, ds=3 (poseidon.cpp:98-101): [B,n,16]->[B,16]."""
    return _sponge_pallas(inputs, oracle.DS_MULTIPLE)


# ---------------------------------------------------------------------------
# Device-side batch loops — chip-capability benchmarking.  The reference's
# Small/Medium-Scale configs (benchmark.cpp:213-235) loop many small
# batches; over a tunneled backend every op submission costs ~0.3 ms of
# runtime overhead regardless of batch size, which buries the chip's own
# per-batch rate.  These run the loop ON DEVICE (lax.fori_loop, each
# iteration's output feeding the next input, so no iteration can be elided
# or overlapped) — one dispatch + one readback for the whole config, with
# the per-iteration grid launch still paid per batch exactly as a
# device-resident caller would pay it.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _pair_loop_chain(l, r, iters: int, scalars):
    def body(_, cur):
        return _sponge_chain(jnp.stack([cur, r], axis=1), scalars)

    return jax.lax.fori_loop(0, iters, body, l)


@functools.partial(jax.jit, static_argnums=(1,))
def _single_loop_chain(x, iters: int, scalars):
    def body(_, cur):
        return _sponge_chain(cur[:, None, :], scalars)

    return jax.lax.fori_loop(0, iters, body, x)


def hash_pair_pallas_loop(left, right, iters: int) -> jnp.ndarray:
    """``iters`` chained rounds of batched pair hashing on device:
    ``state_{i+1} = hash_pair(state_i, right)``; returns the final state
    (bit-equal to calling :func:`hash_pair_pallas` ``iters`` times)."""
    l = jnp.asarray(left, jnp.uint32)
    r = jnp.asarray(right, jnp.uint32)
    if not _on_tpu():  # portable twin: host loop over the jnp path
        for _ in range(iters):
            l = poseidon_mod().hash_pair(l, r)
        return l
    b = l.shape[0]
    bp, active = _bucket_batch(b)
    if bp != b:
        l = jnp.pad(l, ((0, bp - b), (0, 0)))
        r = jnp.pad(r, ((0, bp - b), (0, 0)))
    out = _pair_loop_chain(l, r, iters, _scalars(active, 2, oracle.DS_PAIR))
    return out if bp == b else out[:b]


def hash_single_pallas_loop(x, iters: int) -> jnp.ndarray:
    """``iters`` chained rounds of batched single hashing on device."""
    x = jnp.asarray(x, jnp.uint32)
    if not _on_tpu():  # portable twin: host loop over the jnp path
        for _ in range(iters):
            x = poseidon_mod().hash_single(x)
        return x
    b = x.shape[0]
    bp, active = _bucket_batch(b)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    out = _single_loop_chain(x, iters, _scalars(active, 1, oracle.DS_SINGLE))
    return out if bp == b else out[:b]


# ---------------------------------------------------------------------------
# Packed-wire variants: inputs arrive as [.., 8] uint32 (two 16-bit digits
# per word, fr.pack16 — 32 B/element, half the raw digit bytes) and unpack
# ON DEVICE inside the same single dispatch.  For host-resident operands on
# a tunneled backend the H2D upload is the cost that scales with batch size
# (5-330 MB/s weather, docs/PERF.md), so halving wire bytes halves the
# upload term of every flush; the unpack itself fuses into the chain
# program (a few VPU ops against HBM bandwidth, unmeasurable).  The Mosaic
# kernel inside is byte-identical to the unpacked chains' (same tile
# shapes), so packed chains reuse the per-bucket kernel cache and add only
# cheap XLA-level compiles.  SOUNDNESS: callers must range-check digits
# < 2^16 before packing (fr.pack16 docstring); the coalescing engine gates
# and falls back to the unpacked path.
# ---------------------------------------------------------------------------


@jax.jit
def _single_chain_packed(xp: jnp.ndarray, scalars: jnp.ndarray):
    return _sponge_chain(fr.unpack16(xp)[:, None, :], scalars)


@jax.jit
def _pair_chain_packed(lp: jnp.ndarray, rp: jnp.ndarray, scalars: jnp.ndarray):
    return _sponge_chain(
        jnp.stack([fr.unpack16(lp), fr.unpack16(rp)], axis=1), scalars
    )


@jax.jit
def _multi_chain_packed(xp: jnp.ndarray, scalars: jnp.ndarray):
    return _sponge_chain(fr.unpack16(xp), scalars)


def hash_single_pallas_packed(xp: jnp.ndarray) -> jnp.ndarray:
    """ds=1 hash of PACKED ``[B, 8] uint32`` inputs (fr.pack16 wire format);
    output is standard ``[B, 16]`` digits.  Bit-identical to
    ``hash_single_pallas(fr.unpack16(xp))``."""
    xp = jnp.asarray(xp, jnp.uint32)
    if not _on_tpu():
        return poseidon_mod().hash_single(fr.unpack16(xp))
    b = xp.shape[0]
    bp, active = _bucket_batch(b)
    if bp != b:
        xp = jnp.pad(xp, ((0, bp - b), (0, 0)))
    out = _single_chain_packed(xp, _scalars(active, 1, oracle.DS_SINGLE))
    return out if bp == b else out[:b]


def hash_pair_pallas_packed(lp: jnp.ndarray, rp: jnp.ndarray) -> jnp.ndarray:
    """ds=2 hash of PACKED ``[B, 8]`` left/right operands."""
    lp = jnp.asarray(lp, jnp.uint32)
    rp = jnp.asarray(rp, jnp.uint32)
    if not _on_tpu():
        return poseidon_mod().hash_pair(fr.unpack16(lp), fr.unpack16(rp))
    b = lp.shape[0]
    bp, active = _bucket_batch(b)
    if bp != b:
        lp = jnp.pad(lp, ((0, bp - b), (0, 0)))
        rp = jnp.pad(rp, ((0, bp - b), (0, 0)))
    out = _pair_chain_packed(lp, rp, _scalars(active, 2, oracle.DS_PAIR))
    return out if bp == b else out[:b]


def hash_multiple_pallas_packed(xp: jnp.ndarray) -> jnp.ndarray:
    """ds=3 hash of PACKED ``[B, n, 8]`` groups."""
    xp = jnp.asarray(xp, jnp.uint32)
    b, n = xp.shape[0], xp.shape[1]
    if n == 0:
        return jnp.zeros((b, ND), jnp.uint32)
    if not _on_tpu():
        return poseidon_mod()._sponge_bucketed(fr.unpack16(xp), oracle.DS_MULTIPLE)
    bp, active = _bucket_batch(b)
    if bp != b:
        xp = jnp.pad(xp, ((0, bp - b), (0, 0), (0, 0)))
    out = _multi_chain_packed(xp, _scalars(active, n, oracle.DS_MULTIPLE))
    return out if bp == b else out[:b]


@jax.jit
def _permutation_tiles(xt: jnp.ndarray, n_active: jnp.ndarray):
    """Jitted raw permutation over pre-tiled ``[3, 16, rows, 128]`` states
    (rows bucketed, ``n_active`` dynamic — see :func:`_sponge_tiles`)."""
    rows = xt.shape[2]
    if not _on_tpu():
        # Portable path: scanned element-major permutation (see
        # _verify_tiles on why the slab form is not compiled on CPU).
        from cuzk_tpu import poseidon

        flat = jnp.transpose(
            xt.reshape(3, ND, rows * LANES), (2, 0, 1)
        )  # [B, 3, 16]
        out = poseidon._permute_stacked(flat, full_round0_add=True)
        return jnp.transpose(out, (1, 2, 0)).reshape(3, ND, rows, LANES)
    grid = (rows // SUBLANE_TILE,)
    return pl.pallas_call(
        _permutation_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
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
    )(jnp.asarray(RC_TABLE), n_active, xt)


@jax.jit
def _permutation_chain(padded: jnp.ndarray, n_active: jnp.ndarray):
    """Tile->kernel->untile on BUCKET-PADDED ``[BP, 3, 16]`` states: ONE
    dispatch per call (see :func:`_sponge_chain` for the hop economics)."""
    bp = padded.shape[0]
    xt = jnp.transpose(padded, (1, 2, 0)).reshape(3, ND, bp // LANES, LANES)
    out = _permutation_tiles(xt, n_active)
    return out.reshape(3, ND, bp).transpose(2, 0, 1)


def permutation_pallas(states: jnp.ndarray) -> jnp.ndarray:
    """Raw batched permutation on ``[B, 3, 16]`` states (any canonical
    256-bit values — the analog of batch_permutation).
    Off-TPU: the element-major jnp twin (see :func:`_sponge_pallas`)."""
    states = jnp.asarray(states, jnp.uint32)
    if not _on_tpu():
        return poseidon_mod().permutation(states)
    b = states.shape[0]
    bp, active = _bucket_batch(b)
    if bp != b:
        states = jnp.pad(states, ((0, bp - b), (0, 0), (0, 0)))
    res = _permutation_chain(states, _scalars(active))
    return res if bp == b else res[:b]
