# Development targets (counterpart of the reference Makefile:10-20).

PYTHON ?= python

.PHONY: test test-fast style-test native bench docs clean

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -m "not slow"

style-test:
	$(PYTHON) -m flake8 cornell_moe_tpu/ examples/ bench.py \
		--max-line-length 100 || true

native:
	mkdir -p native/build
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
		-o native/build/libcornell_moe_native.so \
		native/cornell_moe_native.cpp

bench:
	$(PYTHON) bench.py

docs:
	@echo "docs are in docs/ (markdown)"

clean:
	rm -rf native/build __pycache__ **/__pycache__ .pytest_cache
