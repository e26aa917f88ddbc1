"""Engine interface tests: both engines implement the contract and agree."""

import numpy as np
import pytest

from cuzk_tpu import engine, oracle
from cuzk_tpu.field import fr
from cuzk_tpu.field.batch import BatchFieldArithmetic


def test_engines_cross_verify():
    assert engine.verify_engines_match(batch=8)


def test_jnp_engine_permutation_golden():
    e = engine.JnpPoseidonEngine()
    st = fr.ints_to_array([1, 2, 3]).reshape(1, 3, fr.NDIGITS)
    got = fr.array_to_ints(e.batch_permutation(st))
    assert got == oracle.permutation([1, 2, 3])


def test_engine_stats_accumulate():
    e = engine.JnpPoseidonEngine()
    l = fr.ints_to_array([1, 2, 3, 4])
    r = fr.ints_to_array([5, 6, 7, 8])
    e.timed_hash_pairs(l, r)
    assert e.stats.total_hashes == 4
    assert e.stats.batch_count == 1
    assert e.is_initialized()
    assert e.get_optimal_batch_size() <= e.get_max_batch_size()


def test_batch_field_arithmetic():
    bf = BatchFieldArithmetic()
    assert bf.initialize()
    a = fr.ints_to_array([3, oracle.P - 1])
    b = fr.ints_to_array([5, 2])
    assert fr.array_to_ints(bf.batch_add(a, b)) == [
        oracle.add(3, 5), oracle.add(oracle.P - 1, 2)
    ]
    assert fr.array_to_ints(bf.batch_multiply(a, b)) == [
        oracle.mul(3, 5), oracle.mul(oracle.P - 1, 2)
    ]
    assert fr.array_to_ints(bf.batch_power5(a)) == [
        oracle.power5(3), oracle.power5(oracle.P - 1)
    ]
    assert bf.stats.total_time_s > 0


# ---------------------------------------------------------------------------
# CoalescingPoseidonEngine: the default bench path for small batches must be
# covered — per-call slicing, mixed (kind, width) queues, flush threshold,
# get() semantics, and the failed-dispatch recovery path.
# ---------------------------------------------------------------------------

_rng = np.random.default_rng(1234)


def _digits(n, w=None):
    shape = (n, 16) if w is None else (n, w, 16)
    return _rng.integers(0, 1 << 16, shape, np.uint32)


def test_coalescing_interleaved_mixed_calls_bit_exact():
    inner = engine.JnpPoseidonEngine()
    ce = engine.CoalescingPoseidonEngine(inner=engine.JnpPoseidonEngine())
    calls = []  # (deferred, direct result)
    for n in (1, 3, 7):
        x = _digits(n)
        calls.append((ce.async_hash_single(x), inner.batch_hash_single(x)))
        l, r = _digits(n), _digits(n)
        calls.append((ce.async_hash_pairs(l, r), inner.batch_hash_pairs(l, r)))
        for w in (2, 5, 9):
            g = _digits(n, w)
            calls.append(
                (ce.async_hash_multiple(g), inner.batch_hash_multiple(g))
            )
    assert len(ce._queues) == 5  # single, pairs, multiple x {2,5,9}
    for d, want in calls:
        np.testing.assert_array_equal(np.asarray(d.get()), np.asarray(want))
    assert ce._pending == 0 and not ce._queues


def test_coalescing_sync_surface_matches_inner():
    inner = engine.JnpPoseidonEngine()
    ce = engine.CoalescingPoseidonEngine(inner=engine.JnpPoseidonEngine())
    x = _digits(6)
    np.testing.assert_array_equal(
        np.asarray(ce.batch_hash_single(x)),
        np.asarray(inner.batch_hash_single(x)),
    )
    l, r = _digits(4), _digits(4)
    np.testing.assert_array_equal(
        np.asarray(ce.batch_hash_pairs(l, r)),
        np.asarray(inner.batch_hash_pairs(l, r)),
    )
    g = _digits(5, 3)
    np.testing.assert_array_equal(
        np.asarray(ce.batch_hash_multiple(g)),
        np.asarray(inner.batch_hash_multiple(g)),
    )
    st = _rng.integers(0, 1 << 16, (4, 3, 16), np.uint32)
    np.testing.assert_array_equal(
        np.asarray(ce.batch_permutation(st)),
        np.asarray(inner.batch_permutation(st)),
    )


def test_packed_ops_match_unpacked():
    # fr.pack16/unpack16 round-trip + packed hash entry points bit-match
    # the unpacked ones over random canonical inputs (all widths).
    from cuzk_tpu import ops

    x = _digits(9)
    xp = fr.pack16(x)
    assert xp.shape == (9, 8)
    np.testing.assert_array_equal(np.asarray(fr.unpack16(xp)), x)
    np.testing.assert_array_equal(
        np.asarray(ops.hash_single_pallas_packed(xp)),
        np.asarray(ops.hash_single_pallas(x)),
    )
    l, r = _digits(5), _digits(5)
    np.testing.assert_array_equal(
        np.asarray(ops.hash_pair_pallas_packed(fr.pack16(l), fr.pack16(r))),
        np.asarray(ops.hash_pair_pallas(l, r)),
    )
    for w in (0, 2, 5):
        g = _digits(4, w)
        np.testing.assert_array_equal(
            np.asarray(ops.hash_multiple_pallas_packed(fr.pack16(g))),
            np.asarray(ops.hash_multiple_pallas(g)),
        )


def test_coalescing_packed_gate_non_canonical_digits():
    # A flush with a digit >= 2^16 must take the full-width path (packing
    # would alias d and d + 2^16) and still produce bit-exact results.
    inner = engine.PallasPoseidonEngine()
    ce = engine.CoalescingPoseidonEngine(inner=engine.PallasPoseidonEngine())
    x = _digits(4)
    x[2, 3] = (1 << 16) + 7  # non-canonical digit
    d = ce.async_hash_single(x)
    np.testing.assert_array_equal(
        np.asarray(d.get()), np.asarray(inner.batch_hash_single(x))
    )
    # Canonical flush engages the packed path and agrees too.
    y = _digits(6)
    d2 = ce.async_hash_single(y)
    np.testing.assert_array_equal(
        np.asarray(d2.get()), np.asarray(inner.batch_hash_single(y))
    )


def test_coalescing_get_before_and_after_flush():
    ce = engine.CoalescingPoseidonEngine(inner=engine.JnpPoseidonEngine())
    x = _digits(4)
    d1 = ce.async_hash_single(x)
    v1 = np.asarray(d1.get())  # get() forces the flush
    d2 = ce.async_hash_single(x)
    ce.flush()  # explicit flush first
    v2 = np.asarray(d2.get())
    np.testing.assert_array_equal(v1, v2)
    # repeated get() returns the already-materialized value
    np.testing.assert_array_equal(np.asarray(d1.get()), v1)


def test_coalescing_flush_threshold_triggers():
    ce = engine.CoalescingPoseidonEngine(
        inner=engine.JnpPoseidonEngine(), flush_elems=8
    )
    d1 = ce.async_hash_single(_digits(5))
    assert not d1.ready and ce._pending == 5
    d2 = ce.async_hash_single(_digits(5))  # 10 >= 8: auto-flush
    assert d1.ready and d2.ready
    assert ce._pending == 0 and not ce._queues


class _FlakyEngine(engine.JnpPoseidonEngine):
    """Raises on the first batch_hash_single dispatch, then recovers."""

    def __init__(self):
        super().__init__()
        self.fail_next = True

    def batch_hash_single(self, x):
        if self.fail_next:
            self.fail_next = False
            raise RuntimeError("injected dispatch failure")
        return super().batch_hash_single(x)


def test_coalescing_flush_failure_restores_queue():
    """Round-2 finding: a failed dispatch used to orphan every queued
    DeferredHashes (later get() returned None).  The failing queue must be
    restored so get() retries the dispatch."""
    flaky = _FlakyEngine()
    ce = engine.CoalescingPoseidonEngine(inner=flaky)
    x = _digits(3)
    d = ce.async_hash_single(x)
    with pytest.raises(RuntimeError, match="injected"):
        ce.flush()
    assert ce._queues  # the work is still queued
    got = np.asarray(d.get())  # retry succeeds
    want = np.asarray(engine.JnpPoseidonEngine().batch_hash_single(x))
    np.testing.assert_array_equal(got, want)
    assert not ce._queues


def test_coalescing_threshold_flush_failure_is_deferred():
    """A dispatch failure during the threshold-triggered flush must NOT
    escape async_hash_* (the caller would lose the handle before ever
    receiving it); it surfaces at an explicit flush()/get() instead."""
    flaky = _FlakyEngine()
    ce = engine.CoalescingPoseidonEngine(inner=flaky, flush_elems=2)
    x = _digits(3)  # crosses the threshold -> inline flush fails deferred
    d = ce.async_hash_single(x)
    assert ce._queues  # work retained
    # ... but never silently: the deferral is observable (round-4 advisor).
    assert isinstance(ce.last_flush_error, RuntimeError)
    got = np.asarray(d.get())  # retry on get() succeeds
    want = np.asarray(engine.JnpPoseidonEngine().batch_hash_single(x))
    np.testing.assert_array_equal(got, want)
    assert ce.last_flush_error is None  # cleared by the successful flush


def test_coalescing_stats_and_empty_flush():
    ce = engine.CoalescingPoseidonEngine(inner=engine.JnpPoseidonEngine())
    ce.flush()  # empty: no-op
    assert ce.stats.batch_count == 0
    ce.batch_hash_single(_digits(2))
    ce.batch_hash_pairs(_digits(2), _digits(2))
    assert ce.stats.total_hashes == 4
    assert ce.stats.batch_count == 2


def test_deferred_get_raises_computation_error_if_unmaterialized():
    from cuzk_tpu.utils.errors import ComputationError

    ce = engine.CoalescingPoseidonEngine(inner=engine.JnpPoseidonEngine())
    d = engine.DeferredHashes(ce)  # never enqueued: flush cannot fill it
    with pytest.raises(ComputationError):
        d.get()
