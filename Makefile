# Convenience targets; see README.md.

.PHONY: all native test bench acceptance clean

all: native test

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

acceptance:
	python tools/acceptance.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
