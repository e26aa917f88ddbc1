# Convenience targets (the analog of the reference's Makefile wrapper).
PYTHON ?= python

.PHONY: test test-fast bench profile native lint clean

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/test_oracle.py tests/test_utils.py tests/test_native.py -q

bench:
	$(PYTHON) bench.py

bench-all:
	$(PYTHON) -m cuzk_tpu.bench.run --suite all

profile:
	$(PYTHON) -m cuzk_tpu.bench.profile --comprehensive

native:
	$(PYTHON) -c "from cuzk_tpu import native; print(native.ensure_built(force=True))"

clean:
	rm -rf cuzk_tpu/native/_build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
