# Developer entry points (the reference exposes `make test` / `make clippy`,
# reference Makefile:1-7; plus fuzz targets under fuzz/Makefile).

.PHONY: test test-fast bench capi fuzz-py fuzz-capi roofline clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_parallel.py

bench:
	python bench.py

capi:
	$(MAKE) -C capi

fuzz-py:
	python fuzz/fuzz_differential.py --iters 20

# requires clang with libFuzzer
fuzz-capi: capi
	clang -fsanitize=fuzzer -Icapi fuzz/fuzz_capi.c \
		-Lcapi -llambdaworks_kzg_tpu -o fuzz/fuzz_capi
	@echo "run: LD_LIBRARY_PATH=capi PYTHONPATH=. ./fuzz/fuzz_capi"

roofline:
	python -m lambdaworks_kzg_tpu.utils.profiling

clean:
	$(MAKE) -C capi clean
	rm -f fuzz/fuzz_capi
