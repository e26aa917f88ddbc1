"""Benchmark harness for cuzk_tpu (the L4 analog of the reference's
benchmark binaries and shell drivers — SURVEY.md §2 components #10/#11/#14)."""

from cuzk_tpu.bench.run import (
    bench_poseidon,
    bench_merkle_build,
    bench_batch_verify,
    time_fn,
)

__all__ = [
    "bench_poseidon",
    "bench_merkle_build",
    "bench_batch_verify",
    "time_fn",
]
