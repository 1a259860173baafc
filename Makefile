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

# Grouped pytest processes in parallel (tests/run_tests.sh): groups stay
# under this jaxlib's ~30-40-compile-per-process segfault threshold while
# compiling the shared kernel zoo once per GROUP instead of once per file
# (the r3 per-file gate took ~1.5 h); a group that still crashes on a
# signal degrades to per-file processes automatically.
test:
	@sh tests/run_tests.sh

test-serial:
	@for f in tests/test_*.py; do \
	  echo "== $$f"; $(TESTENV) $(PY) -m pytest $$f -x -q; rc=$$?; \
	  if [ $$rc -ne 0 ] && [ $$rc -ne 5 ]; then exit 1; fi; \
	done  # rc 5 = file has only slow-tier tests (deselected here)

test-slow:
	$(TESTENV) $(PY) -m pytest tests/ -x -q -m slow

bench:
	$(PY) bench.py
