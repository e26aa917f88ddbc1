"""Native (C++) host oracle for cuzk_tpu.

The reference's performance-critical host code is C++ (SURVEY.md §2); this
module provides the TPU build's native host component: an independent
4x64-limb implementation of the exact reference semantics (oracle.cpp),
compiled on demand with g++ and loaded via ctypes.  It serves as a fast
third implementation for triple-differential testing (Python-int oracle <->
jnp/Pallas paths <-> C++) and for golden-vector generation at scale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.cpp")
_BUILD_DIR = os.path.join(_DIR, "_build")
_LIB = os.path.join(_BUILD_DIR, "liboraclecpp.so")

_lib: Optional[ctypes.CDLL] = None

_MASK64 = (1 << 64) - 1


def ensure_built(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (
        force
        or not os.path.exists(_LIB)
        or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            [
                "g++",
                "-O2",
                "-std=c++17",
                "-shared",
                "-fPIC",
                _SRC,
                "-o",
                _LIB,
            ],
            check=True,
            capture_output=True,
        )
    return _LIB


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        u64p = ctypes.POINTER(ctypes.c_uint64)
        for name, argtypes in {
            "cuzk_add": [u64p, u64p, u64p],
            "cuzk_sub": [u64p, u64p, u64p],
            "cuzk_mul": [u64p, u64p, u64p],
            "cuzk_red": [u64p, u64p],
            "cuzk_power5": [u64p, u64p],
            "cuzk_permutation": [u64p],
            "cuzk_hash_single": [u64p, u64p],
            "cuzk_hash_pair": [u64p, u64p, u64p],
            "cuzk_hash_multiple": [u64p, ctypes.c_size_t, u64p],
            "cuzk_batch_hash_pairs": [u64p, u64p, u64p, ctypes.c_size_t],
            "cuzk_batch_hash_single": [u64p, u64p, ctypes.c_size_t],
            "cuzk_merkle_root": [u64p, ctypes.c_size_t, ctypes.c_size_t, u64p],
        }.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = None
        _lib = lib
    return _lib


def _to_limbs(x: int) -> List[int]:
    return [(x >> (64 * i)) & _MASK64 for i in range(4)]


def _from_limbs(limbs: Sequence[int]) -> int:
    return sum(int(v) << (64 * i) for i, v in enumerate(limbs))


def _buf(ints: Sequence[int]) -> "ctypes.Array":
    flat: List[int] = []
    for x in ints:
        flat.extend(_to_limbs(x))
    return (ctypes.c_uint64 * len(flat))(*flat)


def _out(n_elems: int) -> "ctypes.Array":
    return (ctypes.c_uint64 * (4 * n_elems))()


def _read(buf, n_elems: int) -> List[int]:
    return [_from_limbs(buf[4 * i : 4 * i + 4]) for i in range(n_elems)]


# ---------------------------------------------------------------------------
# Int-level convenience wrappers (mirror cuzk_tpu.oracle's API)
# ---------------------------------------------------------------------------

def add(a: int, b: int) -> int:
    o = _out(1)
    load().cuzk_add(_buf([a]), _buf([b]), o)
    return _read(o, 1)[0]


def sub(a: int, b: int) -> int:
    o = _out(1)
    load().cuzk_sub(_buf([a]), _buf([b]), o)
    return _read(o, 1)[0]


def mul(a: int, b: int) -> int:
    o = _out(1)
    load().cuzk_mul(_buf([a]), _buf([b]), o)
    return _read(o, 1)[0]


def red(a: int) -> int:
    o = _out(1)
    load().cuzk_red(_buf([a]), o)
    return _read(o, 1)[0]


def power5(a: int) -> int:
    o = _out(1)
    load().cuzk_power5(_buf([a]), o)
    return _read(o, 1)[0]


def permutation(state: Sequence[int]) -> List[int]:
    buf = _buf(list(state))
    load().cuzk_permutation(buf)
    return _read(buf, 3)


def hash_single(x: int) -> int:
    o = _out(1)
    load().cuzk_hash_single(_buf([x]), o)
    return _read(o, 1)[0]


def hash_pair(l: int, r: int) -> int:
    o = _out(1)
    load().cuzk_hash_pair(_buf([l]), _buf([r]), o)
    return _read(o, 1)[0]


def hash_multiple(inputs: Sequence[int]) -> int:
    o = _out(1)
    load().cuzk_hash_multiple(_buf(list(inputs)), len(inputs), o)
    return _read(o, 1)[0]


def batch_hash_pairs(ls: Sequence[int], rs: Sequence[int]) -> List[int]:
    n = len(ls)
    o = _out(n)
    load().cuzk_batch_hash_pairs(_buf(list(ls)), _buf(list(rs)), o, n)
    return _read(o, n)


def merkle_root(leaves: Sequence[int], arity: int) -> int:
    o = _out(1)
    load().cuzk_merkle_root(_buf(list(leaves)), len(leaves), arity, o)
    return _read(o, 1)[0]
