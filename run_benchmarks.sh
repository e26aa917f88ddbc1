#!/bin/bash
# Benchmark driver (the analog of run_poseidon_benchmark.sh /
# run_merkle_benchmarks.sh): quick / full / poseidon-only / merkle-only modes.
set -e
MODE="${1:-quick}"
case "$MODE" in
  quick)    python bench.py ;;
  full)     python -m cuzk_tpu.bench.run --suite all ;;
  poseidon) python -m cuzk_tpu.bench.run --suite poseidon ;;
  merkle)   python -m cuzk_tpu.bench.run --suite merkle
            python -m cuzk_tpu.bench.run --suite proofs ;;
  *) echo "usage: $0 [quick|full|poseidon|merkle]"; exit 1 ;;
esac
