# Convenience targets (the analog of the reference's Makefile wrapper).
PYTHON ?= python

.PHONY: test test-fast test-cold test-stress bench profile native lint clean

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/test_oracle.py tests/test_utils.py tests/test_native.py -q

# Cold-cache suite timing: a throwaway compilation-cache dir pins the
# "cold suite" claim in docs/PERF.md (the default run shares
# /tmp/cuzk_tpu_jax_cache and measures warm; pytest's own summary line
# reports the duration).
test-cold:
	CACHE=$$(mktemp -d /tmp/cuzk_cold_cache.XXXXXX) && \
	JAX_COMPILATION_CACHE_DIR=$$CACHE $(PYTHON) -m pytest tests/ -q; \
	rc=$$?; rm -rf $$CACHE; exit $$rc

# Stress tier (64K+-leaf trees) — the analog of the reference's
# DISABLED_StressTestLargeTree, opt-in like its DISABLED_ prefix.
test-stress:
	CUZK_STRESS=1 $(PYTHON) -m pytest tests/test_stress.py -q

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
