"""MXU-offloaded constant-k fold experiment.

The truncated k-fold reduction (SURVEY.md Appendix A) costs ~2/3 of the
permutation's digit-product ops, and both of its multiplies are BY THE
CONSTANT k — a convolution with a fixed kernel, i.e. a matmul with a
constant banded matrix.  This experiment measures whether riding the MXU
for those folds beats the VPU schoolbook:

  high [16 digits] x k  ->  32 digit columns
  = for each 16-bit output column dd and byte-plane r in {0,1}:
      out[r*32+dd] = sum_i K[r*32+dd, i] * byte_i(high)
    with K[r*32+dd, i] = byte_{2*dd+r-i}(k)  (0 when out of range)
  m32[dd] = out[dd] + (out[32+dd] << 8)      (< 2^30, then one carry pass)

Exactness on the MXU: bytes (0..255) are exact in bf16; each product
(<= 255^2) is exact in the MXU's f32 multiply (8+8 mantissa bits < 24);
the 32-term accumulation stays < 2^21 < 2^24, so the f32 result is the
exact integer.  int8 would need nibble splits (values > 127 go negative);
bf16 bytes halve the operand rows.

Variants measured (all bit-checked against fs.mul_wide(x, k)):
  vpu        — the current fs.mul_wide(high, k) schoolbook (baseline)
  mxu_dot8   — 8 unrolled [64,32]@[32,128] bf16 dots, one per sublane chunk,
               with explicit swapaxes relayouts around them
  mxu_dot3d  — one dot_general over the [8,32,128] batch-free leading axis
  transpose  — just the swapaxes(0,1) round-trip (relayout cost floor)

Run on the real chip:  python experiments/mxu_fold.py [variant ...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cuzk_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuzk_tpu.ops import fieldslab as fs

ROWS = 8
LANES = 128
TILES = 8
N = int(os.environ.get("MICRO_N", "64"))

NB = 32  # bytes per 256-bit value


def _k_bytes():
    return [(fs.K_INT >> (8 * i)) & 0xFF for i in range(NB)]


@functools.lru_cache(maxsize=None)
def k_matrix_bf16():
    """[64, 32] bf16: K[r*32+dd, i] = byte_{2dd+r-i}(k)."""
    kb = _k_bytes()
    m = np.zeros((64, NB), np.float32)
    for r in range(2):
        for dd in range(32):
            for i in range(NB):
                j = 2 * dd + r - i
                if 0 <= j < NB:
                    m[r * 32 + dd, i] = kb[j]
    return m  # numpy; jnp.asarray at use (caching a traced constant leaks tracers)


def _to_bytes_t(h):
    """[16, S, L] u32 digits -> [S, 32, L] u32 byte slabs (byte index on the
    sublane axis, ready to be a dot rhs).  Byte order interleaved
    (lo-byte block then hi-byte block along axis 1) — K's columns are built
    to match i = digit + 16*plane ordering below."""
    h2 = jnp.swapaxes(h, 0, 1)  # [S, 16, L]
    return jnp.concatenate([h2 & 0xFF, h2 >> 8], axis=1)  # [S, 32, L]


@functools.lru_cache(maxsize=None)
def k_matrix_bf16_interleaved():
    """[64, 32] bf16 matching _to_bytes_t's i = d + 16*plane column order:
    byte index of input column i is 2*(i % 16) + (i // 16)."""
    kb = _k_bytes()
    m = np.zeros((64, NB), np.float32)
    for r in range(2):
        for dd in range(32):
            for i in range(NB):
                bi = 2 * (i % 16) + (i // 16)
                j = 2 * dd + r - bi
                if 0 <= j < NB:
                    m[r * 32 + dd, i] = kb[j]
    return m  # numpy; jnp.asarray at use (caching a traced constant leaks tracers)


def mxu_mul_k_dot8(h, km=None):
    """Exact 32-digit h*k via 8 per-chunk [64,32]@[32,128] bf16 dots."""
    bt = _to_bytes_t(h).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)  # [S, 32, L]
    if km is None:
        km = jnp.asarray(k_matrix_bf16_interleaved(), jnp.bfloat16)
    outs = []
    for s in range(ROWS):
        o = jax.lax.dot_general(
            km, bt[s], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [64, L] exact integers < 2^21
        outs.append(o)
    out = jnp.stack(outs, axis=0)  # [S, 64, L] f32
    oi = out.astype(jnp.int32).astype(jnp.uint32)
    m32 = oi[:, :32] + (oi[:, 32:] << 8)  # [S, 32, L] < 2^30
    cols = jnp.swapaxes(m32, 0, 1)  # [32, S, L]
    d, _ = fs.carry(cols)
    return d


def mxu_mul_k_dot3d(h, km=None):
    """Same, one dot_general over the leading chunk axis."""
    bt = _to_bytes_t(h).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)  # [S, 32, L]
    if km is None:
        km = jnp.asarray(k_matrix_bf16_interleaved(), jnp.bfloat16)
    out = jax.lax.dot_general(
        km, bt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [64, S, L]
    oi = out.astype(jnp.int32).astype(jnp.uint32)
    m32 = oi[:32] + (oi[32:] << 8)  # [32, S, L]
    d, _ = fs.carry(m32)
    return d


def vpu_mul_k(h):
    return fs.mul_wide(h, fs.const_col(fs.K_INT, h.shape[1:]))


def reduce_wide_mxu(prod, km):
    """fs.reduce_wide with both constant-k folds on the MXU."""
    low = prod[:16]
    high = prod[16:]
    m = mxu_mul_k_dot8(high, km)
    hc = m[:16]
    mh = m[16:]
    mh_nz = jnp.any(mh != 0, axis=0)
    mhk_low = mxu_mul_k_dot8(mh, km)[:16]
    hc = jnp.where(mh_nz[None], fs.add_wrap_red(hc, mhk_low), hc)
    return fs.add_wrap_red(low, hc)


def mul_vpu_full(x):
    """One full field multiply (the permutation hot op), all-VPU."""
    return fs.mul(x, x)


def mul_mxu_full(x, km):
    """Same multiply with the reduction folds riding the MXU."""
    return reduce_wide_mxu(fs.mul_wide(x, x), km)


def _three(x):
    return x, x ^ jnp.uint32(1), x ^ jnp.uint32(2)


def mul3_vpu(x):
    """Three independent multiplies per iteration (the permutation's ILP)."""
    a, b, c = _three(x)
    return fs.mul(a, a) ^ fs.mul(b, b) ^ fs.mul(c, c)


def mul3_mxu(x, km):
    a, b, c = _three(x)
    return (
        reduce_wide_mxu(fs.mul_wide(a, a), km)
        ^ reduce_wide_mxu(fs.mul_wide(b, b), km)
        ^ reduce_wide_mxu(fs.mul_wide(c, c), km)
    )


BODIES = {
    "vpu": lambda x, km: _fold(vpu_mul_k, x),
    "mxu_dot8": lambda x, km: _fold(lambda h: mxu_mul_k_dot8(h, km), x),
    "mxu_dot3d": lambda x, km: _fold(lambda h: mxu_mul_k_dot3d(h, km), x),
    "mul_vpu": lambda x, km: mul_vpu_full(x),
    "mul_mxu": lambda x, km: mul_mxu_full(x, km),
    "mul3_vpu": lambda x, km: mul3_vpu(x),
    "mul3_mxu": lambda x, km: mul3_mxu(x, km),
    "transpose": lambda x, km: jnp.swapaxes(jnp.swapaxes(x, 0, 1), 0, 1)
    ^ jnp.uint32(1),
}


def _fold(fn, x):
    w = fn(x)
    return w[:16] ^ w[16:]


def check(name):
    """Bit-exactness vs the VPU twin outside the kernel (same jnp math)."""
    rng = np.random.default_rng(9)
    h = jnp.asarray(rng.integers(0, 1 << 16, (16, ROWS, LANES), np.uint32))
    if name in ("mxu_dot8", "mxu_dot3d"):
        impl = {"mxu_dot8": mxu_mul_k_dot8, "mxu_dot3d": mxu_mul_k_dot3d}[name]
        want = np.asarray(jax.jit(vpu_mul_k)(h))
        got = np.asarray(jax.jit(impl)(h))
    elif name == "mul_mxu":
        km = jnp.asarray(k_matrix_bf16_interleaved(), jnp.bfloat16)
        want = np.asarray(jax.jit(mul_vpu_full)(h))
        got = np.asarray(jax.jit(lambda x: mul_mxu_full(x, km))(h))
    else:
        return True
    ok = np.array_equal(got, want)
    print(f"  check[{name}]: {'OK' if ok else 'MISMATCH'}")
    return ok


def run(name):
    body = BODIES[name]
    rows = ROWS * TILES
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 16, (16, rows, LANES), np.uint32))

    def kernel(in_ref, km_ref, out_ref):
        with fs.const_cache(out_ref.shape[-2:]):
            km = km_ref[:]
            def it(_, v):
                return body(v, km)
            out_ref[:] = jax.lax.fori_loop(0, N, it, in_ref[:])

    km_in = jnp.asarray(k_matrix_bf16_interleaved(), jnp.bfloat16)
    fn = jax.jit(
        lambda v, km: pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec(
                    (16, ROWS, LANES), lambda r: (0, r, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (64, NB), lambda r: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (16, ROWS, LANES), lambda r: (0, r, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((16, rows, LANES), jnp.uint32),
        )(v, km)
    )
    fn = functools.partial(fn, km=km_in)
    t_c0 = time.perf_counter()
    _ = np.asarray(fn(x)[0])
    print(f"  (compile {time.perf_counter() - t_c0:.1f}s)")
    reps = 4
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(reps)]
    _ = np.asarray(outs[-1][0])
    dt = (time.perf_counter() - t0) / reps
    n_elem = rows * LANES
    ns = dt / (N * n_elem) * 1e9
    print(f"{name:12s} {ns:8.3f} ns/elem-op ({dt * 1e3:.2f} ms, {N} iters x {n_elem})")


if __name__ == "__main__":
    names = sys.argv[1:] or list(BODIES)
    for n in names:
        if not check(n):
            continue
        run(n)
