"""Microbenchmark of fieldslab primitives inside a Pallas TPU kernel.

Times N loop iterations of one primitive over a [16, 8, 128]-per-tile slab,
grid of TILES tiles, and prints ns per element-op — isolating where the
permutation's time actually goes.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuzk_tpu.ops import fieldslab as fs

ROWS_PER_TILE = int(os.environ.get("MICRO_ROWS", "8"))
LANES = 128
TILES = 8
N = int(os.environ.get("MICRO_N", "64"))

OPS = {}


def op(name):
    def deco(f):
        OPS[name] = f
        return f
    return deco


# Each op maps [16,S,L] -> [16,S,L] so it can loop.
@op("power5")
def _p5(x):
    return fs.power5(x)

@op("square")
def _sq(x):
    return fs.square(x)

@op("mul_full")
def _mf(x):
    return fs.mul(x, x)

@op("mul_wide_only")
def _mw(x):
    w = fs.mul_wide(x, x)
    return w[:16] ^ w[16:]  # consume both halves, keep shape

@op("square_wide_only")
def _sw(x):
    w = fs.square_wide(x)
    return w[:16] ^ w[16:]

@op("reduce_wide_only")
def _rw(x):
    w = jnp.concatenate([x, x ^ jnp.uint32(0x5555)], axis=0)
    return fs.reduce_wide(w)

@op("red10")
def _red10(x):
    for _ in range(10):
        x = fs.red(x)
        x = x ^ jnp.uint32(1)
    return x

@op("carry10")
def _carry10(x):
    for _ in range(10):
        x, _c = fs.carry(x + x)
    return x

@op("mds_rc")
def _mds(x):
    rc = [[d * 3 + i for d in range(16)] for i in range(3)]
    o = fs.mds_rc_fused([x, x ^ jnp.uint32(1), x ^ jnp.uint32(2)], rc)
    return o[0] ^ o[1] ^ o[2]

@op("mul_small10")
def _ms10(x):
    for c in (7, 23, 8, 26, 5, 4, 15, 20, 9, 7):
        x = fs.mul_small_reduced(x, c)
    return x


def make_kernel(body):
    def kernel(in_ref, out_ref):
        with fs.const_cache(out_ref.shape[-2:]):
            def it(_, x):
                return body(x)
            out_ref[:] = jax.lax.fori_loop(0, N, it, in_ref[:])
    return kernel


def run(name):
    body = OPS[name]
    rows = ROWS_PER_TILE * TILES
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 16, (16, rows, LANES), np.uint32))
    fn = jax.jit(
        lambda v: pl.pallas_call(
            make_kernel(body),
            grid=(TILES,),
            in_specs=[pl.BlockSpec((16, ROWS_PER_TILE, LANES), lambda r: (0, r, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, ROWS_PER_TILE, LANES), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, rows, LANES), jnp.uint32),
        )(v)
    )
    _ = np.asarray(fn(x)[0])
    reps = 4
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(reps)]
    _ = np.asarray(outs[-1][0])
    dt = (time.perf_counter() - t0) / reps
    n_elem = rows * LANES
    ns = dt / (N * n_elem) * 1e9
    print(f"{name:18s} {ns:8.2f} ns/elem-op   ({dt*1e3:.2f} ms for {N} iters x {n_elem} elems)")


@op("power5_x2")
def _p5x2(x):
    a = fs.power5(x)
    b = fs.power5(x ^ jnp.uint32(3))
    return a ^ b

@op("power5_x3")
def _p5x3(x):
    a = fs.power5(x)
    b = fs.power5(x ^ jnp.uint32(3))
    c = fs.power5(x ^ jnp.uint32(5))
    return a ^ b ^ c

@op("nop_xor10")
def _nop(x):
    for _ in range(10):
        x = x ^ jnp.uint32(123)
    return x


@op("raw_mulxor128")
def _rawmul(x):
    """16 independent chains x 4 steps of (mul, xor) = 128 vreg-ops/iter over
    [8,128] vregs — the VPU issue-rate ceiling probe.  Traced multipliers +
    interleaved xor defeat constant folding / reassociation."""
    rows = [fs._digit(x, i) for i in range(16)]
    m = fs._digit(x, 0) | jnp.uint32(1)
    m2 = fs._digit(x, 1)
    for _ in range(4):
        rows = [(r * m) ^ m2 for r in rows]
    return jnp.stack(rows, axis=0)


@op("raw_add128")
def _rawadd(x):
    """Same shape, pure adds: 128 vreg adds/iter."""
    rows = [fs._digit(x, i) for i in range(16)]
    m = fs._digit(x, 0)
    m2 = fs._digit(x, 1)
    for _ in range(4):
        rows = [(r + m) + m2 for r in rows]
    return jnp.stack(rows, axis=0)


@op("raw_shift128")
def _rawshift(x):
    """Mask/shift mix (the schoolbook's lo/hi splits): 256 vreg-ops/iter."""
    rows = [fs._digit(x, i) for i in range(16)]
    for _ in range(4):
        rows = [(r >> 16) | ((r & jnp.uint32(0xFFFF)) << 1) for r in rows]
    return jnp.stack(rows, axis=0)



@op("full_round3")
def _fr3(x):
    rc = [[(d * 3 + i) & 0xFFFF for d in range(16)] for i in range(3)]
    s = [x, x ^ jnp.uint32(1), x ^ jnp.uint32(2)]
    sb = [fs.power5(v) for v in s]
    o = fs.mds_rc_fused(sb, rc)
    return o[0] ^ o[1] ^ o[2]

@op("partial_round3")
def _pr3(x):
    rc = [[(d * 3 + i) & 0xFFFF for d in range(16)] for i in range(3)]
    s = [x, x ^ jnp.uint32(1), x ^ jnp.uint32(2)]
    sb = [fs.power5(s[0]), s[1], s[2]]
    o = fs.mds_rc_fused(sb, rc)
    return o[0] ^ o[1] ^ o[2]

if __name__ == "__main__":
    names = sys.argv[1:] or list(OPS)
    for n in names:
        run(n)
