"""Headline benchmark: Poseidon pair-hash throughput per chip (Pallas kernel).

Mirrors the reference's "Large Scale" config (README.md:126, benchmark.cpp:224):
1,000,000 total pair hashes at batch 4096 — here lifted to batch 65536 for
grid efficiency (same total).  Baseline to beat: the A100 CUDA number,
2,145,027 hashes/s (README.md:134, SURVEY.md §6).

Gated by a bit-exactness check against the Python-int oracle (the analog of
the reference's verify_cuda_implementations_match benchmark gate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: kernel compiles over the TPU tunnel run
# minutes; cached executables load in milliseconds.
from cuzk_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache()

BASELINE_PAIR_HASHES_PER_S = 2_145_027.0  # A100 CUDA, README.md:134


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cuzk_tpu import oracle
    from cuzk_tpu.field import fr
    from cuzk_tpu.ops import hash_pair_pallas

    batch = 65536
    total = 1_048_576
    iters = max(1, total // batch)

    rng = np.random.default_rng(42)
    # Distinct buffers cycled per call so no call is a cache hit.
    bufs = [
        (
            jnp.asarray(rng.integers(0, 1 << 16, (batch, fr.NDIGITS), np.uint32)),
            jnp.asarray(rng.integers(0, 1 << 16, (batch, fr.NDIGITS), np.uint32)),
        )
        for _ in range(4)
    ]

    # Warm-up / compile + bit-exactness gate vs the oracle.  Drain each
    # warm-up via an actual readback: block_until_ready does not reliably
    # wait on tunneled TPU backends, and the warm-up must also force the
    # input buffers' host->device upload out of the timed region.
    out = hash_pair_pallas(*bufs[0])
    l0 = fr.array_to_ints(np.asarray(bufs[0][0][:2]))
    r0 = fr.array_to_ints(np.asarray(bufs[0][1][:2]))
    got = fr.array_to_ints(np.asarray(out[:2]))
    if got != [oracle.hash_pair(a, b) for a, b in zip(l0, r0)]:
        print(json.dumps({"metric": "poseidon_pair_hashes_per_s_per_chip",
                          "value": 0, "unit": "hashes/s", "vs_baseline": 0,
                          "error": "bit-exactness gate failed"}))
        sys.exit(1)
    for b in bufs[1:]:
        np.asarray(hash_pair_pallas(*b)[0])

    start = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(hash_pair_pallas(*bufs[i % len(bufs)]))
    # Drain via a tiny readback of the last output: the device executes
    # in order, so last-done == all-done.  (block_until_ready does not
    # reliably wait for remote-tunnel TPU backends.)
    np.asarray(outs[-1][0])
    elapsed = time.perf_counter() - start

    hashes_per_s = (iters * batch) / elapsed
    print(
        json.dumps(
            {
                "metric": "poseidon_pair_hashes_per_s_per_chip",
                "value": round(hashes_per_s, 1),
                "unit": "hashes/s",
                "vs_baseline": round(hashes_per_s / BASELINE_PAIR_HASHES_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
