"""BN254-Fr arithmetic on digit-major "slabs": ``[16, S, L] uint32`` arrays.

This is the kernel-side twin of :mod:`cuzk_tpu.field.fr`, re-laid-out for the
TPU register file: the DIGIT axis is the leading (untiled) dimension and the
batch fills the sublane x lane dimensions, so each 16-bit digit of a batch of
S*L field elements is exactly one (8,128)-shaped vector register row.  Digit
shifts (carry propagation, partial-product placement) become leading-axis
pads — vreg renames, not lane shuffles.  Compare the reference's CUDA design,
which gives each *thread* one element and emulates 64x64 multiplies in 32-bit
halves (cuda_field_element.cuh:234-284); here each *vector op* advances one
digit of 1024+ elements.

All functions reproduce the oracle semantics bit-for-bit (SURVEY.md
Appendix A): wrap-at-2^256 adds, the truncated k-fold reduction with the CPU
``k`` constant, branchlessly.  They are plain jnp programs, usable inside
Pallas kernels and directly testable on any backend.

One deliberate strength reduction beyond layout: :func:`mds_rc_fused`
evaluates a Poseidon MDS row plus the NEXT round's constant as ONE
carry/reduce over the raw digit sum m0+m1+m2+rc (< 4p).  This is bit-exact
because the oracle's chained ``add``s there operate on reduced operands
(< p), where its wrapping add is exact modular addition (poseidon.cpp:148-167
— the chain composes to (m0+m1+m2+rc) mod p).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cuzk_tpu import oracle

NDIGITS = 16
DIGIT_BITS = 16
DIGIT_MASK = 0xFFFF
NDIGITS_WIDE = 32

T = oracle.T
MDS = oracle.MDS


def _const_col(x: int, ndigits: int = NDIGITS) -> np.ndarray:
    """Python int -> ``[ndigits, 1, 1] uint32`` broadcastable digit column."""
    return np.array(
        [(x >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(ndigits)],
        dtype=np.uint32,
    ).reshape(ndigits, 1, 1)


import contextlib

# Trace-local cache of constant columns.  When active (see
# :func:`const_cache`), kernels build each constant ONCE in the outer trace
# and loop bodies close over it (loop-invariant hoisting) — the naive
# per-use rebuild added ~25% to both compile time and instruction count.
_CONST_CACHE = None


@contextlib.contextmanager
def const_cache(batch_shape):
    """Activate constant hoisting for a kernel trace and pre-build the
    standard columns (p, 2p, 4p, k) at ``batch_shape`` in the CURRENT trace
    (so inner fori_loop bodies capture them as invariants, never creating
    them inside their own traces)."""
    global _CONST_CACHE
    old = _CONST_CACHE
    _CONST_CACHE = {}
    try:
        m = 1 << 256
        for v in (K_INT, m - P_INT, m - P2_INT, m - P4_INT):
            const_col(v, batch_shape)
        yield
    finally:
        _CONST_CACHE = old


def const_col(x: int, batch_shape, ndigits: int = NDIGITS) -> jnp.ndarray:
    """Digit column built from scalar immediates at trace time, materialized
    at the full batch shape ``[ndigits, *batch_shape]``.

    Pallas kernels may not capture array constants, and Mosaic cannot
    broadcast ``(n,1,1)`` vectors over the tiled dims, so each digit is a
    scalar splat at the operating shape (folded into splat vregs)."""
    batch_shape = tuple(batch_shape)
    key = (x, batch_shape, ndigits)
    if _CONST_CACHE is not None:
        cached = _CONST_CACHE.get(key)
        if cached is not None:
            return cached
    col = jnp.concatenate(
        [
            jnp.full(
                (1,) + batch_shape,
                np.uint32((x >> (DIGIT_BITS * i)) & DIGIT_MASK),
            )
            for i in range(ndigits)
        ],
        axis=0,
    )
    if _CONST_CACHE is not None:
        _CONST_CACHE[key] = col
    return col


P_INT = oracle.P
P2_INT = 2 * oracle.P
P4_INT = 4 * oracle.P
K_INT = oracle.K



def _last(x: jnp.ndarray) -> jnp.ndarray:
    """x[-1] along axis 0 as a static slice (Mosaic has no dynamic_slice;
    jnp scalar indexing would lower to one even for constant indices)."""
    return jax.lax.index_in_dim(x, x.shape[0] - 1, axis=0, keepdims=False)


def _row(x: jnp.ndarray, i: int) -> jnp.ndarray:
    """x[i:i+1] along axis 0 (static slice, keeps the leading axis)."""
    return jax.lax.slice_in_dim(x, i, i + 1, axis=0)


def _digit(x: jnp.ndarray, i: int) -> jnp.ndarray:
    """x[i] along axis 0 as a static slice + squeeze."""
    return jax.lax.index_in_dim(x, i, axis=0, keepdims=False)


def shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift digits toward higher significance by k along axis 0 (zero-filled,
    same length — drops the top k digits)."""
    if k == 0:
        return x
    pad = [(k, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[: x.shape[0]]


def _ks(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Kogge-Stone inclusive scan of the carry/borrow operator along axis 0:
    G*[i] = carry out of digit i given zero carry into digit 0."""
    n = g.shape[0]
    s = 1
    while s < n:
        g = g | (p & shift_up(g, s))
        p = p & shift_up(p, s)
        s *= 2
    return g


import os as _os_carry

# Sequential ripple carries/borrows beat the Kogge-Stone scans on real
# hardware (~25% whole-hash speedup): fewer ops win over shorter dependency
# chains because the permutation has enough independent chains in flight.
_RIPPLE_CARRY = _os_carry.environ.get("CUZK_RIPPLE_CARRY", "1") == "1"


def carry(cols: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Canonicalize u32 digit columns with values <= 2^32 - 2^16 - 1.

    Returns (digits, carry_out) where carry_out is the exact overflow past
    the top digit (dropped by callers that model the reference's 2^256 wrap).

    Single fused ripple: t_i = cols_i + c_{i-1}; c_i = t_i >> 16 — 3 ops per
    digit.  The incoming carry is < 2^16 (c_i <= (2^32-1) >> 16), so t never
    overflows u32 given the documented input bound.  Every call site is far
    below it: schoolbook column sums < 2^22, canonical-digit adds < 2^17,
    one-digit-constant products <= (2^16-1)^2 = 2^32 - 2^17 + 1.
    (CUZK_RIPPLE_CARRY=0 falls back to squeeze + Kogge-Stone scan — more ops,
    shorter dependency chain; measured slower end-to-end.)
    """
    if _RIPPLE_CARRY:
        n = cols.shape[0]
        out = []
        c = None
        for i in range(n):
            t = _digit(cols, i) if c is None else _digit(cols, i) + c
            out.append(t & DIGIT_MASK)
            c = t >> DIGIT_BITS
        return jnp.stack(out, axis=0), c
    hi = cols >> DIGIT_BITS
    x = (cols & DIGIT_MASK) + shift_up(hi, 1)
    ca = _last(hi)
    g = x >> DIGIT_BITS
    p = ((x & DIGIT_MASK) == DIGIT_MASK).astype(jnp.uint32)
    gs = _ks(g, p)
    out = (x + shift_up(gs, 1)) & DIGIT_MASK
    return out, ca + _last(gs)


def sub_borrow(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) mod 2^(16n) digit-wise; returns (difference, borrow[S,L])
    with borrow == 1 iff a < b (field_arithmetic.cpp:203-219)."""
    a, b = jnp.broadcast_arrays(a, b)
    # (A sequential ripple borrow was measured 2.4x SLOWER end-to-end than
    # this Kogge-Stone scan — unlike the carry in :func:`carry`, where the
    # ripple wins.  Borrows sit on the critical path of every cond_sub.)
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    bs = _ks(g, p)
    out = (a + jnp.uint32(1 << DIGIT_BITS) - b - shift_up(bs, 1)) & DIGIT_MASK
    return out, _last(bs)


def cond_sub(a: jnp.ndarray, m) -> jnp.ndarray:
    """a - m if a >= m else a (general/traced m — the hot path uses
    :func:`cond_sub_const`)."""
    d, borrow = sub_borrow(a, jnp.asarray(m))
    return jnp.where((borrow == 0)[None], d, a)


def cond_sub_const(a: jnp.ndarray, m_int: int) -> jnp.ndarray:
    """a - m if a >= m else a, for a COMPILE-TIME constant 0 < m <= 2^256.

    Computed as one ripple add of the precomputed complement 2^256 - m:
    the carry out of the top digit is exactly the ``a >= m`` predicate and
    the low 256 bits are ``a - m`` — one add chain instead of a borrow scan
    plus a subtract (~4x fewer ops; this sits inside every reduce)."""
    comp = const_col((1 << 256) - m_int, a.shape[1:])
    out = []
    c = None
    for i in range(NDIGITS):
        t = _digit(a, i) + _digit(comp, i)
        if c is not None:
            t = t + c
        out.append(t & DIGIT_MASK)
        c = t >> DIGIT_BITS
    d = jnp.stack(out, axis=0)
    return jnp.where((c == 1)[None], d, a)


def red(a: jnp.ndarray) -> jnp.ndarray:
    """a mod p for canonical a < 2^256 (field_arithmetic.cpp:244-248, as three
    fixed conditional subtracts of 4p/2p/p — exact for a < 8p > 2^256)."""
    a = cond_sub_const(a, P4_INT)
    a = cond_sub_const(a, P2_INT)
    return cond_sub_const(a, P_INT)


def add_rr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field add for reduced operands: one carry + one conditional subtract
    (bit-identical to the oracle add in the < p regime)."""
    s, _ = carry(a + b)
    return cond_sub_const(s, P_INT)


def add_wrap_red(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """The oracle's full add: (a + b) wrapped at 2^256, then reduced
    (field_arithmetic.cpp:172-182).  Valid for ANY canonical inputs."""
    s, _ = carry(a + b)  # dropped carry == the 2^256 wrap
    return red(s)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field subtract with modulus pre-add when a < b
    (field_arithmetic.cpp:184-219)."""
    a, b = jnp.broadcast_arrays(a, b)
    _, borrow = sub_borrow(a, b)
    a_plus_p, _ = carry(a + const_col(P_INT, a.shape[1:]))
    t = jnp.where((borrow == 1)[None], a_plus_p, a)
    d, _ = sub_borrow(t, b)
    return d


class _Accum:
    """Per-column accumulator over the free leading (digit) axis.

    The digit axis is untiled, so each column is its own vreg set: adding a
    product digit into its column is ONE vector add, and the final stack is
    a register concatenation.  This replaces the old pad-rows-to-32-then-sum
    scheme, whose adds over the zero padding nearly doubled the op count."""

    def __init__(self, n: int):
        self.cols: List = [None] * n

    def add(self, c: int, v: jnp.ndarray) -> None:
        cur = self.cols[c]
        self.cols[c] = v if cur is None else cur + v

    def stack(self, fill_shape=None) -> jnp.ndarray:
        cols = self.cols
        if any(c is None for c in cols):
            z = jnp.zeros(fill_shape, jnp.uint32)
            cols = [z if c is None else c for c in cols]
        return jnp.stack(cols, axis=0)


def mul_wide(a: jnp.ndarray, b) -> jnp.ndarray:
    """Exact 512-bit schoolbook product -> [32, S, L]
    (field_arithmetic.cpp:221-238).  ``b`` may be a [16,1,1] constant column.

    Column sums stay < 32*2^16 = 2^21: no overflow before the carry pass."""
    b = jnp.asarray(b)
    acc = _Accum(NDIGITS_WIDE)
    for i in range(NDIGITS):
        t = _row(a, i) * b  # [16, S, L]: 16 digit products in one op
        lo = t & DIGIT_MASK
        hi = t >> DIGIT_BITS
        for j in range(NDIGITS):
            acc.add(i + j, _digit(lo, j))
            acc.add(i + j + 1, _digit(hi, j))
    out, _ = carry(acc.stack())  # product < 2^512: carry_out == 0
    return out


def mul_low(a: jnp.ndarray, b) -> jnp.ndarray:
    """Low 256 bits of the exact product (the truncation in
    field_arithmetic.cpp:318-322)."""
    b = jnp.asarray(b)
    acc = _Accum(NDIGITS)
    for i in range(NDIGITS):
        t = _row(a, i) * b
        lo = t & DIGIT_MASK
        hi = t >> DIGIT_BITS
        for j in range(NDIGITS - i):
            acc.add(i + j, _digit(lo, j))
        for j in range(NDIGITS - i - 1):
            acc.add(i + j + 1, _digit(hi, j))
    out, _ = carry(acc.stack())  # dropped carry == the & M256 truncation
    return out


def reduce_wide(prod: jnp.ndarray) -> jnp.ndarray:
    """Truncated k-fold 512->256 reduction, branchless
    (field_arithmetic.cpp:250-330, SURVEY.md Appendix A).

    The oracle's ``high == 0 -> red(low)`` early-out needs no select here:
    with high == 0 the general path yields m = 0, hc = 0, mh = 0 and
    add(low, 0) == red(low) — bit-identical.  (The mh == 0 select IS
    load-bearing: the oracle keeps hc = m & M256 unreduced in that case.)
    """
    low = prod[:NDIGITS]
    high = prod[NDIGITS:]

    m = mul_wide(high, const_col(K_INT, high.shape[1:]))
    hc = m[:NDIGITS]
    mh = m[NDIGITS:]
    mh_nz = jnp.any(mh != 0, axis=0)

    mhk_low = mul_low(mh, const_col(K_INT, mh.shape[1:]))
    hc = jnp.where(mh_nz[None], add_wrap_red(hc, mhk_low), hc)
    return add_wrap_red(low, hc)


def mul(a: jnp.ndarray, b) -> jnp.ndarray:
    """Field multiply with the reference's exact truncated semantics."""
    return reduce_wide(mul_wide(a, b))


def mul_small(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Field multiply by a one-digit constant (c < 2^16) — bit-identical to
    ``mul(a, c)``, ~6x cheaper: the product is 17 digits and both k-folds are
    one-digit-by-field products.  Drives the MDS coefficients."""
    assert 0 <= c <= DIGIT_MASK
    low, high = carry(a * jnp.uint32(c))  # prod = low + high*2^256, high < 2^16

    k = const_col(K_INT, a.shape[1:])
    m_low, mh = carry(k * high[None])  # m = high*k (17 digits)
    mh_nz = mh != 0

    mhk_low, _ = carry(k * mh[None])  # (mh*k) & M256
    hc = jnp.where(mh_nz[None], add_wrap_red(m_low, mhk_low), m_low)
    # No high == 0 select needed: high == 0 makes hc == 0 and
    # add(low, 0) == red(low), bit-identical to the oracle's early-out.
    return add_wrap_red(low, hc)


def mul_small_reduced(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """:func:`mul_small` specialized to REDUCED inputs (a < p) and c <= 26
    (the MDS coefficients) — bit-identical there, ~45% cheaper.

    Proof of the elided branch: prod = a*c < 26p < 2^259, so
    high = prod >> 256 <= 7 and m = high*k < 8*2^252 < 2^255, hence
    mh = m >> 256 == 0 ALWAYS: the oracle's mh branch is statically dead and
    hc = m exactly.  The final add keeps the oracle's full wrap+reduce
    semantics (low + hc can exceed 2^256).
    """
    assert 0 <= c <= 26
    low, high = carry(a * jnp.uint32(c))  # high <= 7
    k = const_col(K_INT, a.shape[1:])
    hc, _ = carry(k * high[None])  # exact: high*k < 2^255, no 17th digit
    return add_wrap_red(low, hc)


def square_wide(a: jnp.ndarray) -> jnp.ndarray:
    """Exact 512-bit square — same result as ``mul_wide(a, a)`` with ~45%
    fewer digit products (off-diagonal terms counted once and doubled in
    column space, where sums stay < 2^22 in u32)."""
    off = _Accum(NDIGITS_WIDE)
    diag = _Accum(NDIGITS_WIDE)
    for i in range(NDIGITS):
        ai = _row(a, i)
        # diagonal a_i^2 -> column 2i
        d = _digit(ai * ai, 0)
        diag.add(2 * i, d & DIGIT_MASK)
        if 2 * i + 1 < NDIGITS_WIDE:
            diag.add(2 * i + 1, d >> DIGIT_BITS)
        # off-diagonal a_i * a_j for j > i -> columns i+j (counted once here)
        if i + 1 < NDIGITS:
            rest = jax.lax.slice_in_dim(a, i + 1, NDIGITS, axis=0)
            t = ai * rest  # [15-i, S, L]
            lo = t & DIGIT_MASK
            hi = t >> DIGIT_BITS
            for jj in range(NDIGITS - i - 1):
                off.add(2 * i + 1 + jj, _digit(lo, jj))
                off.add(2 * i + 2 + jj, _digit(hi, jj))
    shp = a.shape[1:]
    # off columns < 16*2^16 = 2^20; doubled + diag < 2^22: no overflow.
    cols = 2 * off.stack(shp) + diag.stack(shp)
    out, _ = carry(cols)
    return out


import os as _os

_SYM_SQUARE = _os.environ.get("CUZK_SYM_SQUARE", "1") == "1"


def square(a: jnp.ndarray) -> jnp.ndarray:
    """Field square with the reference's truncated reduction."""
    if _SYM_SQUARE:
        return reduce_wide(square_wide(a))
    return reduce_wide(mul_wide(a, a))


def power5(a: jnp.ndarray) -> jnp.ndarray:
    """a^5 = ((a^2)^2)*a via two symmetric squares + one general multiply
    (field_arithmetic.cpp:332-338)."""
    a2 = square(a)
    a4 = square(a2)
    return mul(a4, a)


# ---------------------------------------------------------------------------
# Fused Poseidon round pieces
# ---------------------------------------------------------------------------

def add_scalar_digits(a: jnp.ndarray, rc_digits: Sequence) -> jnp.ndarray:
    """Raw per-digit add of 16 scalars (static ints or traced SMEM scalars)
    onto a slab — no carry; the caller folds it into its own carry pass."""
    parts = [_row(a, d) + rc_digits[d] for d in range(NDIGITS)]
    return jnp.concatenate(parts, axis=0)


def rc_add(a: jnp.ndarray, rc_digits: Sequence) -> jnp.ndarray:
    """Standalone round-constant add on a reduced value (round 0's RC)."""
    s, _ = carry(add_scalar_digits(a, rc_digits))
    return cond_sub_const(s, P_INT)


def mds_rc_fused(
    sboxed: Sequence[jnp.ndarray], rc_rows: Optional[Sequence[Sequence]]
) -> List[jnp.ndarray]:
    """One Poseidon MDS layer + (optionally) the next round's constants.

    new_i = (sum_j MDS[i][j]*sboxed[j]  + rc_rows[i]) mod p, evaluated as one
    carry over the raw digit sum (< 4p) plus two conditional subtracts —
    bit-exact vs the oracle's chained adds (all operands reduced, so its
    wrapping add is exact modular addition there; poseidon.cpp:128-167).
    """
    out = []
    for i in range(T):
        # S-box outputs are always reduced (< p): the specialized MDS
        # multiply's precondition holds throughout the permutation.
        m0 = mul_small_reduced(sboxed[0], MDS[T * i + 0])
        m1 = mul_small_reduced(sboxed[1], MDS[T * i + 1])
        m2 = mul_small_reduced(sboxed[2], MDS[T * i + 2])
        s = m0 + m1 + m2  # digit sums < 3*2^16
        if rc_rows is not None:
            s = add_scalar_digits(s, rc_rows[i])
        d, _ = carry(s)  # value < 4p < 2^256: nothing dropped
        d = cond_sub_const(d, P2_INT)
        d = cond_sub_const(d, P_INT)
        out.append(d)
    return out
