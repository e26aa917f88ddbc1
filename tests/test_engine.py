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
