"""Field-element I/O: hex/dec string round-trips and deterministic randoms.

Parity with the reference's FieldElement string interface
(field_arithmetic.cpp:103-159: to_hex_string / to_decimal_string /
from_hex_string) and its mt19937_64-based ``FieldArithmetic::random``
(field_arithmetic.cpp:340-351).
"""

from __future__ import annotations

from typing import List

from cuzk_tpu import oracle
from cuzk_tpu.field import fr


def to_hex(x, width: int = 64) -> str:
    """Digit array or int -> 0x-prefixed, zero-padded hex
    (field_arithmetic.cpp:103-117 prints all 256 bits)."""
    if not isinstance(x, int):
        x = fr.digits_to_int(x)
    return f"0x{x:0{width}x}"


def from_hex(s: str):
    """Hex string (with or without 0x) -> ``[16] uint32`` digit vector
    (field_arithmetic.cpp:133-159)."""
    v = int(s, 16)
    if v >= 1 << 256:
        raise ValueError("hex value exceeds 256 bits")
    return fr.int_to_digits(v)


def to_decimal(x) -> str:
    """field_arithmetic.cpp:119-131 (exact, unlike the reference's
    double-based approximation for large values — documented divergence:
    the reference's to_decimal_string is lossy above 2^64)."""
    if not isinstance(x, int):
        x = fr.digits_to_int(x)
    return str(x)


def from_decimal(s: str):
    return fr.int_to_digits(int(s, 10))


def random_element(seed: int = None) -> "fr.np.ndarray":
    """One uniformly-random reduced element.

    The reference draws 4 u64s from mt19937_64 and reduces
    (field_arithmetic.cpp:340-351); this reproduces that exact stream when
    ``seed`` is given.
    """
    return random_elements(1, seed)[0]


def random_elements(count: int, seed: int = None):
    """[count, 16] uint32 of reduced elements from the reference's RNG
    scheme: 4 mt19937_64 draws per element, little-endian, then red()."""
    gen = oracle._MT19937_64(seed if seed is not None else 42)
    out: List[int] = []
    for _ in range(count):
        limbs = [gen.next() for _ in range(4)]
        v = sum(l << (64 * i) for i, l in enumerate(limbs))
        out.append(oracle.red(v))
    return fr.ints_to_array(out)
