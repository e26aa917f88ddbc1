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


# ---------------------------------------------------------------------------
# Native exact-grouping scheduler (scheduler.cpp): the hot host primitives
# of the dedup verify schedule — byte-exact row/triple partitioning via a
# hash table that compares full contents on every probe (no trusted
# hashes, no confirmation pass).  cuzk_tpu.merkle uses these when
# available and falls back to the numpy bucket-and-confirm path otherwise.
# ---------------------------------------------------------------------------

_SCHED_SRC = os.path.join(_DIR, "scheduler.cpp")
_SCHED_LIB = os.path.join(_BUILD_DIR, "libcuzkscheduler.so")

_sched_lib = None


def ensure_scheduler_built(force: bool = False) -> str:
    """Compile the scheduler library if missing/stale; returns its path."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (
        force
        or not os.path.exists(_SCHED_LIB)
        or os.path.getmtime(_SCHED_LIB) < os.path.getmtime(_SCHED_SRC)
    ):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             _SCHED_SRC, "-o", _SCHED_LIB],
            check=True,
            capture_output=True,
        )
    return _SCHED_LIB


def load_scheduler() -> ctypes.CDLL:
    global _sched_lib
    if _sched_lib is None:
        lib = ctypes.CDLL(ensure_scheduler_built())
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        lib.cuzk_group_rows.argtypes = [u8p, i64, i64, i64, i32p, i32p]
        lib.cuzk_group_rows.restype = i64
        lib.cuzk_group_triples.argtypes = [i32p, i32p, i32p, i64, i32p, i32p]
        lib.cuzk_group_triples.restype = i64
        _sched_lib = lib
    return _sched_lib


def scheduler_available() -> bool:
    try:
        load_scheduler()
        return True
    except Exception:
        return False


def group_rows(rows):
    """Exact byte-equality partition of ``rows`` (``[k, w]`` numpy array;
    last axis contiguous, row width a multiple of 8 bytes — every proof
    row shape satisfies both).  Returns ``(first, inv)`` int32 arrays:
    first-occurrence row index per group, group id per row."""
    import numpy as np

    k = int(rows.shape[0])
    wbytes = int(rows.shape[1]) * rows.itemsize
    if rows.strides[1] != rows.itemsize or wbytes % 8 or rows.strides[0] <= 0:
        raise ValueError("rows must have a contiguous 8-byte-multiple row")
    first = np.empty(k, np.int32)
    inv = np.empty(k, np.int32)
    lib = load_scheduler()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u = lib.cuzk_group_rows(
        ctypes.cast(rows.ctypes.data, u8p), k, int(rows.strides[0]), wbytes,
        first.ctypes.data_as(i32p), inv.ctypes.data_as(i32p),
    )
    return first[:u].copy(), inv


def group_triples(a, b, c):
    """Exact partition of ``(a[i], b[i], c[i])`` int32 triples (the suffix
    key: parent-suffix group, sibling-row group, position).  Same outputs
    as :func:`group_rows`; no bit-width limits on the components."""
    import numpy as np

    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    c = np.ascontiguousarray(c, np.int32)
    k = int(a.shape[0])
    first = np.empty(k, np.int32)
    inv = np.empty(k, np.int32)
    lib = load_scheduler()
    i32p = ctypes.POINTER(ctypes.c_int32)
    u = lib.cuzk_group_triples(
        a.ctypes.data_as(i32p), b.ctypes.data_as(i32p),
        c.ctypes.data_as(i32p), k,
        first.ctypes.data_as(i32p), inv.ctypes.data_as(i32p),
    )
    return first[:u].copy(), inv
