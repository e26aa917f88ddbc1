"""Utils tests: I/O round-trips, validators, RNG stream parity."""

import pytest

from cuzk_tpu import oracle
from cuzk_tpu.field import fr
from cuzk_tpu.utils import (
    ComputationError,
    HashingStats,
    IndexError_,
    ValidationError,
    from_decimal,
    from_hex,
    random_elements,
    to_decimal,
    to_hex,
    validate_index,
    validate_non_empty,
    validate_range,
)


def test_hex_roundtrip():
    for x in [0, 1, oracle.P - 1, (1 << 256) - 1, 0xDEADBEEF]:
        assert int(to_hex(x), 16) == x
        assert fr.digits_to_int(from_hex(to_hex(x))) == x
    assert to_hex(42).startswith("0x")
    assert len(to_hex(42)) == 66
    with pytest.raises(ValueError):
        from_hex("1" + "0" * 64)


def test_decimal_roundtrip():
    for x in [0, 7, oracle.P - 1]:
        assert to_decimal(x) == str(x)
        assert fr.digits_to_int(from_decimal(to_decimal(x))) == x


def test_random_matches_reference_rng_scheme():
    """4 mt19937_64 draws per element, little-endian, reduced
    (field_arithmetic.cpp:340-351)."""
    els = random_elements(3, seed=123)
    gen = oracle._MT19937_64(123)
    for i in range(3):
        limbs = [gen.next() for _ in range(4)]
        want = oracle.red(sum(l << (64 * j) for j, l in enumerate(limbs)))
        assert fr.digits_to_int(els[i]) == want
        assert fr.digits_to_int(els[i]) < oracle.P


def test_validators():
    assert validate_range(5, 2, 8) == 5
    with pytest.raises(ValidationError):
        validate_range(1, 2, 8, "arity")
    assert validate_index(0, 4) == 0
    with pytest.raises(IndexError_):
        validate_index(4, 4)
    assert validate_non_empty([1]) == [1]
    with pytest.raises(ValidationError):
        validate_non_empty([])


def test_hashing_stats():
    s = HashingStats(total_hashes=1000, total_time_s=0.5)
    assert s.hashes_per_second == 2000
    assert s.ns_per_hash == 500_000.0
    assert HashingStats().hashes_per_second == 0.0


def test_profiler_cli_smoke():
    """The profiler harness (the Nsight-CLI analog, profile.py) runs a tiny
    config end-to-end and reports sane stats."""
    from cuzk_tpu.bench.profile import profile_hash

    res = profile_hash(128, 2, "pairs")
    assert res["total_hashes"] == 256
    assert res["hashes_per_s"] > 0
    assert res["mode"] == "pairs"
