"""Time the real 64-round permutation kernel vs a static-RC unrolled variant.

Isolates the cost of (a) traced SMEM RC reads inside fori_loop phases vs
(b) fully-unrolled rounds with RC digits as compile-time immediates.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from cuzk_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuzk_tpu import oracle
from cuzk_tpu.ops import fieldslab as fs
from cuzk_tpu.ops import poseidon_pallas as pp

ROWS = 8
LANES = 128
TILES = int(os.environ.get("PERM_TILES", "8"))
REPEAT = int(os.environ.get("PERM_REPEAT", "8"))  # permutations per kernel call


def _unrolled_permute(s):
    """All 64 rounds unrolled with RC as Python-int immediates."""
    rcs = [
        [
            [(oracle.RC[oracle.T * r + i] >> (16 * d)) & 0xFFFF for d in range(16)]
            for i in range(3)
        ]
        for r in range(64)
    ]
    s = tuple(fs.rc_add(s[i], rcs[0][i]) for i in range(3))
    for r in range(64):
        nxt = rcs[r + 1] if r + 1 < 64 else None
        if r < 4 or r >= 60:
            sb = [fs.power5(x) for x in s]
        else:
            sb = [fs.power5(s[0]), s[1], s[2]]
        s = tuple(fs.mds_rc_fused(sb, nxt))
    return s


def kernel_real(rc_ref, in_ref, out_ref):
    with fs.const_cache(out_ref.shape[-2:]):
        s = [in_ref[i] for i in range(3)]
        for _ in range(REPEAT):
            s = list(pp._permute(s, rc_ref))
        for i in range(3):
            out_ref[i] = s[i]


def _permute_dual(sa, sb, rc):
    """Two independent states through the 64 rounds with the PARTIAL phase
    interleaved (VERDICT r4 item 5): the 56 partial rounds are a single
    power5 dependency chain per state at tile 8, so issuing two states'
    chains side by side can fill any latency stalls — IF the ~2x state
    working set does not spill (tile 16 spilled 3.3x; here the full
    rounds run sequentially per state to cap peak pressure, and the MDS
    layers alternate so only one state's temporaries are live at once)."""

    def rc_row(r, i):
        return [rc[r, i, d] for d in range(16)]

    sa = tuple(fs.rc_add(sa[i], rc_row(0, i)) for i in range(3))
    sb = tuple(fs.rc_add(sb[i], rc_row(0, i)) for i in range(3))

    def full_body(r, st):
        sa, sb = st
        nxt = [rc_row(r + 1, i) for i in range(3)]
        sa = tuple(fs.mds_rc_fused([fs.power5(x) for x in sa], nxt))
        sb = tuple(fs.mds_rc_fused([fs.power5(x) for x in sb], nxt))
        return sa, sb

    def partial_body(r, st):
        sa, sb = st
        nxt = [rc_row(r + 1, i) for i in range(3)]
        # The two power5 chains are independent — the scheduler may
        # interleave them; MDS layers stay sequential per state.
        a0 = fs.power5(sa[0])
        b0 = fs.power5(sb[0])
        sa = tuple(fs.mds_rc_fused([a0, sa[1], sa[2]], nxt))
        sb = tuple(fs.mds_rc_fused([b0, sb[1], sb[2]], nxt))
        return sa, sb

    st = (sa, sb)
    st = jax.lax.fori_loop(0, 4, full_body, st)
    st = jax.lax.fori_loop(4, 60, partial_body, st)
    st = jax.lax.fori_loop(60, 63, full_body, st)
    sa, sb = st
    sa = fs.mds_rc_fused([fs.power5(x) for x in sa], None)
    sb = fs.mds_rc_fused([fs.power5(x) for x in sb], None)
    return sa, sb


def kernel_dual(rc_ref, in_ref, out_ref):
    with fs.const_cache((ROWS, LANES)):
        sa = [in_ref[i, :, :ROWS] for i in range(3)]
        sb = [in_ref[i, :, ROWS:] for i in range(3)]
        for _ in range(REPEAT):
            sa, sb = _permute_dual(sa, sb, rc_ref)
        for i in range(3):
            out_ref[i, :, :ROWS] = sa[i]
            out_ref[i, :, ROWS:] = sb[i]


def kernel_unrolled(in_ref, out_ref):
    with fs.const_cache(out_ref.shape[-2:]):
        s = [in_ref[i] for i in range(3)]
        for _ in range(REPEAT):
            s = list(_unrolled_permute(s))
        for i in range(3):
            out_ref[i] = s[i]


def run(which):
    rng = np.random.default_rng(3)
    rows = ROWS * TILES
    x_h = rng.integers(0, 1 << 16, (3, 16, rows, LANES), np.uint32)
    # REDUCED inputs (< 2^240 < p): _permute's round-0 fast-path rc_add
    # assumes reduced state (the sponge always feeds it reduced values);
    # arbitrary 256-bit inputs belong to the full_round0_add=True public
    # permutation path, not this micro-benchmark.
    x_h[:, 15] = 0
    x = jnp.asarray(x_h)
    if which == "real":
        fn = jax.jit(
            lambda v: pl.pallas_call(
                kernel_real,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(TILES,),
                    in_specs=[pl.BlockSpec((3, 16, ROWS, LANES), lambda r, *_: (0, 0, r, 0), memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((3, 16, ROWS, LANES), lambda r, *_: (0, 0, r, 0), memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((3, 16, rows, LANES), jnp.uint32),
            )(jnp.asarray(pp.RC_TABLE), v)
        )
    elif which == "dual":
        assert TILES % 2 == 0
        fn = jax.jit(
            lambda v: pl.pallas_call(
                kernel_dual,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(TILES // 2,),
                    in_specs=[pl.BlockSpec((3, 16, 2 * ROWS, LANES), lambda r, *_: (0, 0, r, 0), memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((3, 16, 2 * ROWS, LANES), lambda r, *_: (0, 0, r, 0), memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((3, 16, rows, LANES), jnp.uint32),
            )(jnp.asarray(pp.RC_TABLE), v)
        )
    else:
        fn = jax.jit(
            lambda v: pl.pallas_call(
                kernel_unrolled,
                grid=(TILES,),
                in_specs=[pl.BlockSpec((3, 16, ROWS, LANES), lambda r: (0, 0, r, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((3, 16, ROWS, LANES), lambda r: (0, 0, r, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((3, 16, rows, LANES), jnp.uint32),
            )(v)
        )
    t0 = time.perf_counter()
    out = fn(x)
    first = np.asarray(out[0, 0])
    compile_s = time.perf_counter() - t0
    # correctness: one lane vs oracle
    v0 = [sum(int(np.asarray(out)[i, d, 0, 0]) << (16 * d) for d in range(16)) for i in range(3)]
    s0 = [sum(int(np.asarray(x)[i, d, 0, 0]) << (16 * d) for d in range(16)) for i in range(3)]
    exp = s0
    for _ in range(REPEAT):
        exp = oracle.permutation(exp)
    ok = v0 == exp
    reps = 4
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(reps)]
    _ = np.asarray(outs[-1][0, 0])
    dt = (time.perf_counter() - t0) / reps
    n = rows * LANES
    ns = dt / (REPEAT * n) * 1e9
    print(
        f"{which:9s} {ns:7.2f} ns/perm/elem  ({dt*1e3:.2f} ms, compile {compile_s:.0f}s, exact={'OK' if ok else 'FAIL'})",
        flush=True,
    )


if __name__ == "__main__":
    for w in sys.argv[1:] or ["real", "unrolled"]:
        run(w)
