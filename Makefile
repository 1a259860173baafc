# CI gate — mirrors the reference's .github/workflows/build.yml:16-30
# (build + test + fmt + clippy on every push).  Python analog: compile-check,
# lint, fast test tier.  `make check` is what CI runs on every commit.

PY ?= python
TESTENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: check lint test test-slow test-prod bench

check: lint test

lint:
	$(PY) -m py_compile $$(find tpu_mpc tests -name '*.py') bench.py __graft_entry__.py
	@if $(PY) -c "import pyflakes" 2>/dev/null; then \
	  $(PY) -m pyflakes tpu_mpc bench.py __graft_entry__.py; \
	else echo "pyflakes not installed; py_compile only"; fi

# Split into three pytest processes: this jaxlib's CPU backend segfaults
# compiling a fresh kernel after ~30 tests' worth of in-process compiled
# programs (reproduced deterministically at tests/test_gg18.py in a single
# full-suite process, passes in any smaller grouping) — process isolation
# resets the LLVM JIT state.  Functionally identical coverage.
test:
	$(TESTENV) $(PY) -m pytest tests/test_[a-f]*.py -x -q
	$(TESTENV) $(PY) -m pytest tests/test_g*.py -x -q
	$(TESTENV) $(PY) -m pytest tests/test_[h-z]*.py -x -q

test-slow:
	$(TESTENV) $(PY) -m pytest tests/ -x -q -m slow

bench:
	$(PY) bench.py
