"""Vectorized BN254-Fr arithmetic for TPU: ``[..., 16] uint32`` digit arrays.

TPU-first re-limbing of the reference's 4x64-bit ``FieldElement``
(field_arithmetic.hpp:11-44): a field element is 16 little-endian 16-bit
digits held in uint32 lanes, so every digit product fits a native u32
multiply on the VPU (the reference's CUDA code emulates 64x64 multiplies via
32-bit halves, cuda_field_element.cuh:234-284 — on TPU we pick the limb width
so no emulation is needed at all).

Every function here is a pure, batch-vectorized jnp program that reproduces
``cuzk_tpu.oracle`` bit-for-bit, including the deliberate reference quirks
(wrap-at-2^256 adds, truncated k-fold reduction — SURVEY.md Appendix A).
Data-dependent branches of the C++ code (``if (high == 0)``, ``while (a >= p)``)
are made branchless with digit-wise borrow chains and selects, so everything
compiles to static-shape XLA.

This module is the *reference path*; the Pallas kernels in ``cuzk_tpu.ops``
are the accelerated path and are tested differentially against it (the same
oracle/accelerator invariant the reference maintains between its CPU and CUDA
implementations, SURVEY.md §1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cuzk_tpu import oracle

NDIGITS = 16  # 16 x 16-bit = 256 bits
DIGIT_BITS = 16
DIGIT_MASK = 0xFFFF
NDIGITS_WIDE = 2 * NDIGITS  # 512-bit products


def int_to_digits(x: int, ndigits: int = NDIGITS) -> np.ndarray:
    """Python int -> little-endian 16-bit digit vector (uint32)."""
    if x < 0 or x >= 1 << (DIGIT_BITS * ndigits):
        raise ValueError(f"value out of range for {ndigits} digits")
    return np.array(
        [(x >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(ndigits)],
        dtype=np.uint32,
    )


def digits_to_int(d) -> int:
    """Digit vector (any length) -> Python int."""
    d = np.asarray(d)
    if d.ndim != 1:
        raise ValueError("digits_to_int takes a single element; use batch helpers")
    return sum(int(v) << (DIGIT_BITS * i) for i, v in enumerate(d.tolist()))


def ints_to_array(xs, ndigits: int = NDIGITS) -> np.ndarray:
    """Sequence of ints -> [n, ndigits] uint32 batch."""
    return np.stack([int_to_digits(int(x), ndigits) for x in xs])


def array_to_ints(a) -> list:
    """[..., ndigits] -> nested list of Python ints (flattened batch)."""
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    return [digits_to_int(row) for row in flat]


# Constants as numpy digit vectors (folded into compiled executables).
P_DIGITS = int_to_digits(oracle.P)
P2_DIGITS = int_to_digits(2 * oracle.P)
P4_DIGITS = int_to_digits(4 * oracle.P)
K_DIGITS = int_to_digits(oracle.K)
ZERO_DIGITS = int_to_digits(0)
ONE_DIGITS = int_to_digits(1)
TWO_DIGITS = int_to_digits(2)


def _carry(cols: jnp.ndarray, ndigits: int) -> jnp.ndarray:
    """Sequential carry pass: columns (< 2^32 - 2^16 each) -> canonical 16-bit
    digits, dropping any carry out of the top digit (the 2^256 / 2^512 wrap
    of the reference, field_arithmetic.cpp:172-182)."""
    out = []
    c = jnp.zeros_like(cols[..., 0])
    for i in range(ndigits):
        t = cols[..., i] + c
        out.append(t & DIGIT_MASK)
        c = t >> DIGIT_BITS
    return jnp.stack(out, axis=-1)


def _carry_keep(cols: jnp.ndarray, ndigits: int):
    """Like :func:`_carry` but also returns the final carry digit."""
    out = []
    c = jnp.zeros_like(cols[..., 0])
    for i in range(ndigits):
        t = cols[..., i] + c
        out.append(t & DIGIT_MASK)
        c = t >> DIGIT_BITS
    return jnp.stack(out, axis=-1), c


def _sub_digits(a: jnp.ndarray, b: jnp.ndarray):
    """Digit-wise (a - b) mod 2^(16n) with borrow chain.

    Returns (difference, borrow) where borrow == 1 iff a < b.  Matches the
    reference's borrow-subtract with dropped final borrow
    (field_arithmetic.cpp:203-219).
    """
    a, b = jnp.broadcast_arrays(a, b)
    n = a.shape[-1]
    out = []
    borrow = jnp.zeros_like(a[..., 0])
    base = jnp.uint32(1 << DIGIT_BITS)
    for i in range(n):
        t = a[..., i] + base - b[..., i] - borrow
        out.append(t & DIGIT_MASK)
        borrow = jnp.uint32(1) - (t >> DIGIT_BITS)
    return jnp.stack(out, axis=-1), borrow


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b as a boolean over the batch."""
    _, borrow = _sub_digits(a, b)
    return borrow == 0


def _cond_sub(a: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """a - m if a >= m else a (one step of the subtractive reduce)."""
    diff, borrow = _sub_digits(a, jnp.asarray(m))
    return jnp.where((borrow == 0)[..., None], diff, a)


def red(a: jnp.ndarray) -> jnp.ndarray:
    """a mod p for any canonical a < 2^256.

    The reference loops ``while (a >= p) a -= p`` (up to 5 iterations,
    field_arithmetic.cpp:244-248); subtracting 4p/2p/p conditionally yields
    the identical residue in 3 fixed steps (2^256 - 1 < 6p).
    """
    a = _cond_sub(a, P4_DIGITS)
    a = _cond_sub(a, P2_DIGITS)
    a = _cond_sub(a, P_DIGITS)
    return a


def wrap_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod 2^256 — the reference's carry-dropping limb add."""
    a, b = jnp.broadcast_arrays(a, b)
    return _carry(a + b, NDIGITS)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field add with 2^256 wrap, valid for ANY canonical inputs < 2^256
    (field_arithmetic.cpp:172-182)."""
    return red(wrap_add(a, b))


def add_rr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field add for REDUCED operands (a, b < p): a+b < 2p < 2^256 never
    wraps and needs a single conditional subtract.  Bit-identical to
    :func:`add` in this regime; used on the permutation hot path."""
    a, b = jnp.broadcast_arrays(a, b)
    return _cond_sub(_carry(a + b, NDIGITS), P_DIGITS)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field subtract with modulus pre-add when a < b
    (field_arithmetic.cpp:184-219).  Both the 2^256 carry of the pre-add and
    the final borrow are dropped, matching the limb code exactly."""
    a, b = jnp.broadcast_arrays(a, b)
    _, borrow = _sub_digits(a, b)
    a_plus_p = _carry(a + jnp.asarray(P_DIGITS), NDIGITS)
    t = jnp.where((borrow == 1)[..., None], a_plus_p, a)
    diff, _ = _sub_digits(t, b)
    return diff


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact 512-bit schoolbook product as 32 canonical digits
    (field_arithmetic.cpp:221-238).

    Each 16x16-bit digit product fits u32; products are split into lo/hi
    halves and accumulated per column (max 32 terms < 2^16 each, so columns
    stay < 2^21 — no overflow before the carry pass).
    """
    a, b = jnp.broadcast_arrays(a, b)
    prod = a[..., :, None] * b[..., None, :]  # [..., 16, 16], exact in u32
    lo = prod & DIGIT_MASK
    hi = prod >> DIGIT_BITS
    cols = jnp.zeros(a.shape[:-1] + (NDIGITS_WIDE,), jnp.uint32)
    for i in range(NDIGITS):
        cols = cols.at[..., i : i + NDIGITS].add(lo[..., i, :])
        cols = cols.at[..., i + 1 : i + 1 + NDIGITS].add(hi[..., i, :])
    return _carry(cols, NDIGITS_WIDE)


def mul_low(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Low 256 bits of the exact product: ``(a*b) & (2^256-1)``.

    Only digit products with i+j <= 15 can influence the low half; the carry
    out of digit 15 is discarded (the truncation in
    field_arithmetic.cpp:318-322).
    """
    a, b = jnp.broadcast_arrays(a, b)
    prod = a[..., :, None] * b[..., None, :]
    lo = prod & DIGIT_MASK
    hi = prod >> DIGIT_BITS
    cols = jnp.zeros(a.shape[:-1] + (NDIGITS,), jnp.uint32)
    for i in range(NDIGITS):
        cols = cols.at[..., i:].add(lo[..., i, : NDIGITS - i])
        if i + 1 < NDIGITS:
            cols = cols.at[..., i + 1 :].add(hi[..., i, : NDIGITS - i - 1])
    return _carry(cols, NDIGITS)


def reduce_wide(prod: jnp.ndarray) -> jnp.ndarray:
    """The truncated k-fold 512->256 reduction, branchless
    (field_arithmetic.cpp:250-330; semantics pinned in SURVEY.md Appendix A).

    All three oracle branches (high == 0, mh == 0, mh != 0) are computed and
    selected per element, so the compiled program is data-independent.
    """
    low = prod[..., :NDIGITS]
    high = prod[..., NDIGITS:]
    high_zero = jnp.all(high == 0, axis=-1)

    m = mul_wide(high, jnp.asarray(K_DIGITS))
    hc = m[..., :NDIGITS]
    mh = m[..., NDIGITS:]
    mh_zero = jnp.all(mh == 0, axis=-1)

    mhk_low = mul_low(mh, jnp.asarray(K_DIGITS))  # (mh*k) & M — high part dropped
    hc = jnp.where(mh_zero[..., None], hc, add(hc, mhk_low))
    nonzero_result = add(low, hc)
    return jnp.where(high_zero[..., None], red(low), nonzero_result)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field multiply: exact 512-bit product + truncated reduction."""
    return reduce_wide(mul_wide(a, b))


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def power5(a: jnp.ndarray) -> jnp.ndarray:
    """a^5 = ((a^2)^2)*a (field_arithmetic.cpp:332-338)."""
    a2 = mul(a, a)
    a4 = mul(a2, a2)
    return mul(a4, a)


def mul_small(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Field multiply by a small constant c < 2^16 — bit-identical to
    ``mul(a, c)`` but ~6x cheaper.

    Because c fits one digit, the 512-bit product is 17 digits (high < 2^16),
    and both k-fold multiplies inside the reduction are also
    one-digit-by-field products.  Used for the tiny MDS coefficients
    {4..26} on the permutation hot path (SURVEY.md §7 hard part #2).
    """
    c = jnp.asarray(c, jnp.uint32)
    low, high = _carry_keep(a * c[..., None], NDIGITS)  # prod = low + high*2^256
    high_zero = high == 0

    k = jnp.asarray(K_DIGITS)
    m_low, mh = _carry_keep(k * high[..., None], NDIGITS)  # m = high*k, 17 digits
    mh_zero = mh == 0

    mhk_low, _ = _carry_keep(k * mh[..., None], NDIGITS)  # (mh*k) & M
    hc = jnp.where(mh_zero[..., None], m_low, add(m_low, mhk_low))
    nonzero_result = add(low, hc)
    return jnp.where(high_zero[..., None], red(low), nonzero_result)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    return jnp.all(a == b, axis=-1)


# Jit the public entry points: each op is a few hundred to a few thousand XLA
# primitives per trace (digit-level carry chains), so eager per-op dispatch is
# pathologically slow.  Compiled once per shape, they fuse into tight VPU code.
add = jax.jit(add)
add_rr = jax.jit(add_rr)
sub = jax.jit(sub)
red = jax.jit(red)
wrap_add = jax.jit(wrap_add)
mul_wide = jax.jit(mul_wide)
mul_low = jax.jit(mul_low)
mul = jax.jit(mul)
square = jax.jit(square)
power5 = jax.jit(power5)
mul_small = jax.jit(mul_small)
geq = jax.jit(geq)
eq = jax.jit(eq)
is_zero = jax.jit(is_zero)
