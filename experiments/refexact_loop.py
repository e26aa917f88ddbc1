"""Harvest loop for the REFERENCE-EXACT batch-verify workload.

The reference's 14.8 ms / 5K-proof number comes from
test_merkle_benchmark_cuda.cpp:185-210: batch_size=5000 proofs over a
1024-LEAF arity-4 tree (``idx = i % leaf_count`` — each leaf proved ~5
times).  The main bench's 5K x 50K-leaf config is strictly harder (5000
distinct paths vs 1024); this loop measures the reference's own workload
so the comparison is apples-to-apples, re-timing it with conditions on
an interval like experiments/weather_sweep.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/refexact_loop.py [hours]
"""

import json
import sys
import time

from cuzk_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache()

from cuzk_tpu.bench import run as br  # noqa: E402

MAX_HOURS = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
INTERVAL = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1200
OUT = "/tmp/refexact.jsonl"


def log(obj):
    obj["t"] = round(time.time())
    obj["config"] = "ref-exact 5000x1024 a4"
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)


def main():
    start = time.time()
    while time.time() - start < MAX_HOURS * 3600:
        try:
            log(br.tunnel_conditions())
            log(br.bench_batch_verify(5000, 1024, 4, iters=5))
            log(br.bench_batch_verify_resident(5000, 1024, 4, iters=20))
        except Exception as e:
            log({"suite": "refexact_loop", "error": repr(e)[:200]})
        time.sleep(INTERVAL)
    log({"suite": "refexact_loop", "msg": "done"})


if __name__ == "__main__":
    main()
