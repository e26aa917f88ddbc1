"""CLI alias: ``python -m cuzk_tpu.bench.cli`` -> the full benchmark suite."""

from cuzk_tpu.bench.run import main

if __name__ == "__main__":
    main()
