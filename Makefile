.PHONY: all native test test-fast bench clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/core/test_fitting.py

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
