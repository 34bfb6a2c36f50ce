# Developer entry points (the reference exposes `make test` / `make clippy`,
# reference Makefile:1-7; plus per-function fuzz targets mirroring
# reference fuzz/Makefile:64-86).

FUZZ_FNS = blob_to_kzg_commitment compute_kzg_proof compute_blob_kzg_proof \
           verify_kzg_proof verify_blob_kzg_proof verify_blob_kzg_proof_batch

.PHONY: test test-all test-fast bench capi native corpus fuzz-py fuzz-capi roofline check-aot \
        clean $(addprefix fuzz_,$(FUZZ_FNS))

# fast tier (<10 min on a 1-core box): everything but the multi-minute
# device/mesh compile tests; CI and `make test-all` run the full suite
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

capi:
	$(MAKE) -C capi

native:
	$(MAKE) -C native

# seed corpora: consensus-vector inputs (cross-impl oracle) + generated
corpus:
	python fuzz/gen_corpus.py

fuzz-py:
	python fuzz/fuzz_differential.py --iters 20

# requires clang with libFuzzer. Combined first-byte-dispatch harness:
fuzz-capi: capi
	clang -fsanitize=fuzzer -Icapi fuzz/fuzz_capi.c \
		-Lcapi -llambdaworks_kzg_tpu -o fuzz/fuzz_capi
	@echo "run: LD_LIBRARY_PATH=capi PYTHONPATH=. ./fuzz/fuzz_capi testdata/corpus/combined"

# dedicated exact-size harnesses, one per entry point (reference parity):
#   make fuzz_verify_kzg_proof && LD_LIBRARY_PATH=capi PYTHONPATH=. \
#     ./fuzz/fuzz_verify_kzg_proof testdata/corpus/verify_kzg_proof
FUZZ_N_FIELD ?= 4
FUZZ_SETUP ?= testdata/trusted_setup_4.txt

fuzz_blob_to_kzg_commitment:       FUZZ_ID = 0
fuzz_compute_kzg_proof:            FUZZ_ID = 1
fuzz_compute_blob_kzg_proof:       FUZZ_ID = 2
fuzz_verify_kzg_proof:             FUZZ_ID = 3
fuzz_verify_blob_kzg_proof:        FUZZ_ID = 4
fuzz_verify_blob_kzg_proof_batch:  FUZZ_ID = 5
$(addprefix fuzz_,$(FUZZ_FNS)): capi
	clang -fsanitize=fuzzer -Icapi -DFUZZ_TARGET=$(FUZZ_ID) \
		-DN_FIELD=$(FUZZ_N_FIELD) -DTRUSTED_SETUP_PATH='"$(FUZZ_SETUP)"' \
		fuzz/fuzz_capi.c -Lcapi -llambdaworks_kzg_tpu -o fuzz/$@
	@echo "run: LD_LIBRARY_PATH=capi PYTHONPATH=. ./fuzz/$@ testdata/corpus/$(patsubst fuzz_%,%,$@)"

# no-clang fallback: replay + mutate the seed corpora through every
# dedicated harness (what CI smoke runs; gcc has no libFuzzer)
fuzz-replay: capi corpus
	@for id in 0 1 2 3 4 5; do \
	  fn=$$(echo $(FUZZ_FNS) | cut -d' ' -f$$((id+1))); \
	  gcc -O2 -Icapi -DFUZZ_TARGET=$$id -DSTANDALONE_REPLAY \
	    -DTRUSTED_SETUP_PATH='"testdata/trusted_setup_4.txt"' \
	    fuzz/fuzz_capi.c -Lcapi -llambdaworks_kzg_tpu -o fuzz/replay_$$fn && \
	  LD_LIBRARY_PATH=capi PYTHONPATH=. ./fuzz/replay_$$fn \
	    testdata/corpus/$$fn/*.bin || exit 1; \
	done

# native tier under ASan+UBSan: the 1,400-line manual-carry C++ is where
# memory/UB bugs would hide (reference has only -fsanitize=fuzzer on its
# fuzz harnesses). Runs the native unit tests against the instrumented
# .so; leak checking is off because the host interpreter (CPython)
# "leaks" interned objects by design.
native-asan:
	$(MAKE) -C native asan
	LWKZG_NATIVE_LIB=native/libbls12381_native_asan.so \
	LD_PRELOAD=$$($(CXX) -print-file-name=libasan.so) \
	ASAN_OPTIONS=detect_leaks=0 \
	python -m pytest tests/test_native.py tests/test_pairing.py -q

# fail if shipped cache/aot_*.jaxexp artifacts predate the current kernels
check-aot:
	python -m pytest tests/test_aot_guard.py -q

roofline:
	python -m lambdaworks_kzg_tpu.utils.profiling

clean:
	$(MAKE) -C capi clean
	$(MAKE) -C native clean || true
	rm -f fuzz/fuzz_capi $(addprefix fuzz/fuzz_,$(FUZZ_FNS))
