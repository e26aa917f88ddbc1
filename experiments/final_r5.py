"""Round-5 final measurement session: every recorded number in ONE process
(Mosaic executables do not persist across processes, so one process pays
the compiles once) with tunnel conditions before and after each suite.

Round-5 additions over final_r4: chip-capability hash rows (device-side
batch loop, slope-timed) for every reference config, and the
failure-isolation (tampered-batch) verify rows at both the reference-exact
and at-scale configs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/final_r5.py [out.jsonl]
"""

import json
import sys
import time

from cuzk_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache()

from cuzk_tpu.bench import run as br  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/final_r5.jsonl"


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
    # Chip-capability rows (hop-free slope timing) + the interconnect-bound
    # coalesced rows, same session (VERDICT r4 item 2).
    for batch, total, _label in br.POSEIDON_CONFIGS:
        for mode in ("pairs", "single"):
            log(br.bench_poseidon_resident(batch, total, mode))
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
    log(br.tunnel_conditions())
    # Failure isolation: one tampered proof must cost ~the honest pass.
    log(br.bench_batch_verify_tampered(5000, 1024, 4, iters=5))
    log(br.bench_batch_verify_tampered(50_000, 50_000, 4, iters=3))
    log(br.bench_incremental_update(50_000, 4))
    log(br.tunnel_conditions())
    log({"suite": "final_r5", "msg": "done"})


if __name__ == "__main__":
    main()
