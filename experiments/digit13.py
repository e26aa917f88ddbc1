"""13-bit-digit field multiply prototype — op-count experiment.

The 16-bit-digit schoolbook must split every 32-bit product into lo/hi
before accumulating (column sums of raw products would overflow u32), so
each of the 16 iterations costs 16 mul + 16 mask + 16 shift + 32 add = 80
vreg-ops.  With 13-bit digits the products are < 2^26 and a full column of
20 raw products stays < 20*2^26 < 2^31: products accumulate UNSPLIT —
20 mul + 20 add per iteration, one digitizing carry pass at the end.
Predicted ~1.45x on mul_wide; this experiment measures the real ratio for
the full reference-semantics multiply (mul_wide + truncated k-fold reduce),
bit-checked against the 16-digit production path via conversion.

Layout: [20, S, L] u32 slabs, 13-bit digits, little-endian.  256-bit
boundary: 256 = 19*13 + 9 -> bit 9 of digit 19.  The wrap at 2^256 masks
digit 19 to 9 bits; prod >> 256 realigns the upper digits by 9 bits.

Run: python experiments/digit13.py [mul16 mul13 ...]  (MICRO_N=4096 for
compute-bound numbers; N=64 measures the dispatch floor instead.)
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

from cuzk_tpu import oracle
from cuzk_tpu.ops import fieldslab as fs

ROWS = 8
LANES = 128
TILES = 8
N = int(os.environ.get("MICRO_N", "64"))

D = 13              # digit bits
ND = 20             # digits per 256(+4)-bit value (20*13 = 260)
NDW = 40            # digits per 512(+8)-bit wide value
MASK = (1 << D) - 1
# 2^256 boundary: bit B_OFF of digit B_DIG
B_DIG, B_OFF = divmod(256, D)   # 19, 9

P_INT = oracle.P
K_INT = oracle.K


def _digit(x, i):
    return jax.lax.index_in_dim(x, i, axis=0, keepdims=False)


def _row(x, i):
    return jax.lax.slice_in_dim(x, i, i + 1, axis=0)


import contextlib

_CACHE = None


@contextlib.contextmanager
def cache13(batch_shape):
    """Trace-local constant hoisting (mirrors fs.const_cache): pre-build k
    and the red complements in the OUTER trace so fori_loop bodies capture
    them as loop invariants."""
    global _CACHE
    old = _CACHE
    _CACHE = {}
    try:
        m = 1 << 256
        for v in (K_INT, m - P_INT, m - 2 * P_INT, m - 4 * P_INT):
            const13(v, batch_shape)
        yield
    finally:
        _CACHE = old


def const13(x: int, batch_shape, nd: int = ND):
    key = (x, tuple(batch_shape), nd)
    if _CACHE is not None and key in _CACHE:
        return _CACHE[key]
    col = jnp.concatenate(
        [
            jnp.full((1,) + tuple(batch_shape), np.uint32((x >> (D * i)) & MASK))
            for i in range(nd)
        ],
        axis=0,
    )
    if _CACHE is not None:
        _CACHE[key] = col
    return col


def carry13(cols, nd=None):
    """Digitize u32 columns (each < 2^31) into 13-bit digits + carry-out.
    Incoming carry < 2^19; cols + carry < 2^31 + 2^19 < 2^32: no overflow."""
    n = cols.shape[0]
    out = []
    c = None
    for i in range(n):
        t = _digit(cols, i) if c is None else _digit(cols, i) + c
        out.append(t & MASK)
        c = t >> D
    return jnp.stack(out, axis=0), c


def mul_wide13(a, b):
    """Exact 520-bit product of 260-bit values as [40, S, L] raw columns ->
    digitized.  NO per-product lo/hi splits."""
    cols = [None] * NDW
    for i in range(ND):
        t = _row(a, i) * b  # [20, S, L] raw products < 2^26
        for j in range(ND):
            d = _digit(t, j)
            cols[i + j] = d if cols[i + j] is None else cols[i + j] + d
    stacked = jnp.stack(
        [c if c is not None else jnp.zeros_like(cols[0]) for c in cols], axis=0
    )
    out, _ = carry13(stacked)  # product < 2^520: carry-out 0
    return out


def split256(w):
    """[40,S,L] digitized wide value -> (low [20,S,L] = w mod 2^256,
    high [20,S,L] = w >> 256).  Realign by B_OFF=9 bits at digit B_DIG=19."""
    lo_rows = [(_digit(w, i)) for i in range(B_DIG)]
    lo_rows.append(_digit(w, B_DIG) & ((1 << B_OFF) - 1))
    low = jnp.stack(lo_rows, axis=0)
    hi_rows = []
    for i in range(ND):
        lo_part = _digit(w, B_DIG + i) >> B_OFF
        hi_src = B_DIG + i + 1
        if hi_src < NDW:
            lo_part = lo_part | ((_digit(w, hi_src) << (D - B_OFF)) & MASK)
        hi_rows.append(lo_part)
    high = jnp.stack(hi_rows, axis=0)
    return low, high


def wrap256(x):
    """(x mod 2^256) for a digitized [20,S,L] value: mask digit 19."""
    rows = [_digit(x, i) for i in range(ND - 1)]
    rows.append(_digit(x, ND - 1) & ((1 << B_OFF) - 1))
    return jnp.stack(rows, axis=0)


def cond_sub_const13(a, m_int, batch_shape):
    """a - m if a >= m else a, for canonical a < 2^256 (digit 19 < 2^9).
    One ripple add of the complement 2^256 - m; carry past bit 256 (bit
    B_OFF of digit 19) is the a >= m predicate."""
    comp = const13((1 << 256) - m_int, batch_shape)
    out = []
    c = None
    for i in range(ND):
        t = _digit(a, i) + _digit(comp, i)
        if c is not None:
            t = t + c
        out.append(t & MASK)
        c = t >> D
    # bit 256 carry: digit 19 of the sum (pre-mask) reaching 2^9.
    # out[19] holds 13 bits; the >= predicate is whether the raw sum's bit
    # 256 is set.  Reconstruct: raw19 = out[19] + (c << 13)?  Simpler: redo
    # digit 19 logic — the wrap carry is (raw_t19 >> B_OFF) & 1 when comp
    # was built with its 2^256 bit dropped... comp < 2^256 so the borrow
    # predicate is carry-out past digit 19's bit 9, i.e. bit 9+ of raw t19.
    # raw t19 = out[19] | (c << 13); predicate = raw t19 >> 9 != 0 ... but
    # c is the carry PAST digit 19 (bits >= 260) — for canonical a and comp
    # (digit19 < 2^9) t19 < 2^10+..: c == 0 always, predicate = out19 >> 9.
    pred = out[ND - 1] >> B_OFF
    out[ND - 1] = out[ND - 1] & ((1 << B_OFF) - 1)
    d = jnp.stack(out, axis=0)
    return jnp.where((pred != 0)[None], d, a)


def red13(a, batch_shape):
    """a mod p for canonical a < 2^256 (three conditional subtracts)."""
    a = cond_sub_const13(a, 4 * P_INT, batch_shape)
    a = cond_sub_const13(a, 2 * P_INT, batch_shape)
    return cond_sub_const13(a, P_INT, batch_shape)


def add_wrap_red13(a, b, batch_shape):
    """(a + b) wrapped at 2^256 then reduced (the oracle add)."""
    s, _ = carry13(a + b)
    return red13(wrap256(s), batch_shape)


def mul_low13(a, b):
    """Low 260-bit digits of the product (enough to wrap at 2^256)."""
    cols = [None] * ND
    for i in range(ND):
        t = _row(a, i) * b
        for j in range(ND - i):
            d = _digit(t, j)
            cols[i + j] = d if cols[i + j] is None else cols[i + j] + d
    stacked = jnp.stack(cols, axis=0)
    out, _ = carry13(stacked)
    return wrap256(out)


def mul13(a, b, batch_shape):
    """Full reference-semantics multiply on 13-bit slabs (SURVEY.md App A).
    a, b canonical (< 2^256, digit 19 < 2^9)."""
    w = mul_wide13(a, b)
    low, high = split256(w)
    m = mul_wide13(high, const13(K_INT, batch_shape))
    hc, mh = split256(m)
    mh_nz = jnp.any(mh != 0, axis=0)
    mhk_low = mul_low13(mh, const13(K_INT, batch_shape))
    hc2 = add_wrap_red13(hc, mhk_low, batch_shape)
    hc = jnp.where(mh_nz[None], hc2, hc)
    return add_wrap_red13(low, hc, batch_shape)


# --- conversions (kernel-boundary cost, amortized over 64 rounds) ---------

def to13(x16):
    """[16,S,L] 16-bit digits -> [20,S,L] 13-bit digits."""
    rows = []
    for i in range(ND):
        lo_bit = D * i
        src, off = divmod(lo_bit, 16)
        v = _digit(x16, src) >> off
        if off + D > 16 and src + 1 < 16:
            v = v | (_digit(x16, src + 1) << (16 - off))
        rows.append(v & MASK)
    return jnp.stack(rows, axis=0)


def to16(x13):
    """[20,S,L] 13-bit digits -> [16,S,L] 16-bit digits."""
    rows = []
    for i in range(16):
        lo_bit = 16 * i
        src, off = divmod(lo_bit, D)
        v = _digit(x13, src) >> off
        used = D - off
        k = 1
        while used < 16 and src + k < ND:
            v = v | (_digit(x13, src + k) << used)
            used += D
            k += 1
        rows.append(v & jnp.uint32(0xFFFF))
    return jnp.stack(rows, axis=0)


# --- bodies ----------------------------------------------------------------

def body16(x, shp):
    return fs.mul(x, x)


def body13(x, shp):
    return mul13(x, x, shp)


def body13_3(x, shp):
    a = mul13(x, x, shp)
    b = mul13(x ^ jnp.uint32(1), x ^ jnp.uint32(1), shp)
    c = mul13(x ^ jnp.uint32(2), x ^ jnp.uint32(2), shp)
    return a ^ b ^ c


def body16_3(x, shp):
    a = fs.mul(x, x)
    b = fs.mul(x ^ jnp.uint32(1), x ^ jnp.uint32(1))
    c = fs.mul(x ^ jnp.uint32(2), x ^ jnp.uint32(2))
    return a ^ b ^ c


BODIES = {
    "mul16": (16, body16),
    "mul13": (ND, body13),
    "mul16x3": (16, body16_3),
    "mul13x3": (ND, body13_3),
}


def check():
    """mul13 == fs.mul under conversion, for random canonical inputs."""
    rng = np.random.default_rng(11)
    a16 = jnp.asarray(rng.integers(0, 1 << 16, (16, ROWS, LANES), np.uint32))
    b16 = jnp.asarray(rng.integers(0, 1 << 16, (16, ROWS, LANES), np.uint32))

    def f13(a, b):
        with cache13(a.shape[1:]):
            return to16(mul13(to13(a), to13(b), a.shape[1:]))

    want = np.asarray(jax.jit(fs.mul)(a16, b16))
    got = np.asarray(jax.jit(f13)(a16, b16))
    ok = np.array_equal(got, want)
    print(f"  check[mul13 vs fs.mul]: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.argwhere((got != want).any(axis=0))
        print("   first mismatch at", bad[:3])
    return ok


def run(name):
    nd, body = BODIES[name]
    rows = ROWS * TILES
    rng = np.random.default_rng(3)
    if nd == 16:
        x = jnp.asarray(rng.integers(0, 1 << 16, (16, rows, LANES), np.uint32))
    else:
        # canonical 13-bit slabs: top digit < 2^9
        arr = rng.integers(0, 1 << D, (ND, rows, LANES), np.uint32)
        arr[ND - 1] &= (1 << B_OFF) - 1
        x = jnp.asarray(arr)

    cache = fs.const_cache if nd == 16 else cache13

    def kernel(in_ref, out_ref):
        shp = out_ref.shape[-2:]
        with cache(shp):
            def it(_, v):
                return body(v, shp)

            out_ref[:] = jax.lax.fori_loop(0, N, it, in_ref[:])

    fn = jax.jit(
        lambda v: pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec(
                    (nd, ROWS, LANES), lambda r: (0, r, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (nd, ROWS, LANES), lambda r: (0, r, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((nd, rows, LANES), jnp.uint32),
        )(v)
    )
    t0 = time.perf_counter()
    _ = np.asarray(fn(x)[0])
    print(f"  (compile {time.perf_counter() - t0:.1f}s)")
    reps = 4
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(reps)]
    _ = np.asarray(outs[-1][0])
    dt = (time.perf_counter() - t0) / reps
    n_elem = rows * LANES
    ns = dt / (N * n_elem) * 1e9
    print(f"{name:10s} {ns:8.3f} ns/elem-op ({dt * 1e3:.2f} ms, {N} iters x {n_elem})")


if __name__ == "__main__":
    if not check():
        sys.exit(1)
    for n in sys.argv[1:] or list(BODIES):
        run(n)
