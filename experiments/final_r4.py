"""Round-4 final measurement session: every recorded number in ONE process
(Mosaic executables do not persist across processes, so one process pays
the compiles once) with tunnel conditions before and after each suite.

Order: hardware-verify artifact first (it gates everything else), then
the reference config matrix, builds, proof generation, both batch-verify
configs (ours: 5K x 50K-leaf; reference-exact: 5K x 1024-leaf,
test_merkle_benchmark_cuda.cpp:185-210) with the phase-decomposed
resident benchmark, and incremental updates.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/final_r4.py [out.jsonl]
"""

import json
import sys
import time

from cuzk_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache()

from cuzk_tpu.bench import run as br  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/final_r4.jsonl"


def log(obj):
    obj["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)


def main():
    log(br.tunnel_conditions())
    ok = br.verify_paths_match()
    log({"suite": "verify_paths_match", "ok": ok})
    if not ok:
        raise SystemExit("paths disagree")
    res = br.run_hardware_verify("docs/TPU_VERIFY.json", stress=True)
    if not res["all_ok"]:
        raise SystemExit("hardware verify failed")

    log(br.tunnel_conditions())
    for batch, total, _label in br.POSEIDON_CONFIGS:
        for mode in ("pairs", "single"):
            log(br.bench_poseidon(batch, total, mode, "pallas"))
    log(br.tunnel_conditions())
    log(br.bench_merkle_build(50_000, 4))
    log(br.bench_merkle_build(1_000_000, 8))
    log(br.bench_proof_generation(5000, 50_000, 4))
    log(br.tunnel_conditions())
    log(br.bench_batch_verify(5000, 50_000, 4, iters=5))
    log(br.bench_batch_verify_resident(5000, 50_000, 4, iters=20))
    log(br.bench_batch_verify(5000, 1024, 4, iters=5))
    log(br.bench_batch_verify_resident(5000, 1024, 4, iters=20))
    log(br.bench_batch_verify(50_000, 50_000, 4, iters=3))
    log(br.bench_batch_verify_resident(50_000, 50_000, 4, iters=10))
    log(br.bench_incremental_update(50_000, 4))
    log(br.tunnel_conditions())
    log({"suite": "final_r4", "msg": "done"})


if __name__ == "__main__":
    main()
