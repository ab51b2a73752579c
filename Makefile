# Build + test entry points (CI runs these; reference analog:
# /root/reference/Makefile -> extension-ci-tools makefiles).

PYTHON ?= python

.PHONY: all native test test-fast bench clean

all: native

native:
	$(MAKE) -C native

test: native
	$(PYTHON) -m pytest tests/ -q

test-fast: native
	$(PYTHON) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PYTHON) bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache build *.egg-info
