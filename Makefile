# swipe-tpu top-level targets (the reference builds with a plain Makefile
# too, Makefile:47-75; here the Python package needs no build step and the
# native aligner is optional)

.PHONY: all native test bench fuzz clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-configs:
	python bench_configs.py

fuzz:
	python tools/fuzz_golden.py 200

clean:
	$(MAKE) -C native clean || true
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
