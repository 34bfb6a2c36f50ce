/*
 * libFuzzer harnesses for the C ABI (capi/liblambdaworks_kzg_tpu.so).
 *
 * Parity+ with the reference's six dedicated targets (reference
 * fuzz/<fn>/fuzz.c, exact input sizes per fuzz/Makefile:64-86): ONE
 * source compiled six ways. `-DFUZZ_TARGET=<0..5>` selects a dedicated
 * exact-size harness (make fuzz_<fn>); without it, the combined
 * first-byte-dispatch harness builds (make fuzz-capi). The setup loads
 * once per process (reference fuzz/base_fuzz.h:17-34).
 *
 * Seed corpora: python fuzz/gen_corpus.py (cross-implementation valid
 * inputs lifted from the consensus vectors — the oracle role the
 * reference fills with the c-kzg-4844 Go bindings, fuzz/gen_corpus/
 * main.go — plus fresh valid inputs generated through this library).
 *
 * Build (clang with libFuzzer): see Makefile targets fuzz_<fn>.
 */
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "lambdaworks_kzg_tpu.h"

#ifndef TRUSTED_SETUP_PATH
#define TRUSTED_SETUP_PATH "../testdata/trusted_setup_4.txt"
#endif
#ifndef N_FIELD
#define N_FIELD 4
#endif
#define BLOB_BYTES (N_FIELD * 32)
#define BATCH_N 3 /* reference batch target fuzzes a fixed item count */

static KZGSettings settings;
static int initialized = 0;

static void init_once(void) {
    if (initialized) return;
    /* force the host math tier: fuzzing wants max exec/s, not TPU */
    setenv("LWKZG_BACKEND", "host", 0);
    FILE *f = fopen(TRUSTED_SETUP_PATH, "r");
    if (f == NULL || load_trusted_setup_file(&settings, f) != C_KZG_OK) {
        fprintf(stderr, "fuzz: failed to load trusted setup\n");
        exit(1);
    }
    fclose(f);
    initialized = 1;
}

static void t_blob_to_kzg_commitment(const uint8_t *data, size_t size) {
    Bytes48 out48;
    if (size == BLOB_BYTES)
        blob_to_kzg_commitment(&out48, (const Blob *)data, &settings);
}

static void t_compute_kzg_proof(const uint8_t *data, size_t size) {
    Bytes48 out48;
    Bytes32 out32;
    if (size == BLOB_BYTES + 32)
        compute_kzg_proof(&out48, &out32, (const Blob *)data,
                          (const Bytes32 *)(data + BLOB_BYTES), &settings);
}

static void t_compute_blob_kzg_proof(const uint8_t *data, size_t size) {
    Bytes48 out48;
    if (size == BLOB_BYTES + 48)
        compute_blob_kzg_proof(&out48, (const Blob *)data,
                               (const Bytes48 *)(data + BLOB_BYTES),
                               &settings);
}

static void t_verify_kzg_proof(const uint8_t *data, size_t size) {
    bool ok;
    if (size == 48 + 32 + 32 + 48)
        verify_kzg_proof(&ok, (const Bytes48 *)data,
                         (const Bytes32 *)(data + 48),
                         (const Bytes32 *)(data + 80),
                         (const Bytes48 *)(data + 112), &settings);
}

static void t_verify_blob_kzg_proof(const uint8_t *data, size_t size) {
    bool ok;
    if (size == BLOB_BYTES + 96)
        verify_blob_kzg_proof(&ok, (const Blob *)data,
                              (const Bytes48 *)(data + BLOB_BYTES),
                              (const Bytes48 *)(data + BLOB_BYTES + 48),
                              &settings);
}

static void t_verify_blob_kzg_proof_batch(const uint8_t *data, size_t size) {
    bool ok;
    if (size == BATCH_N * (BLOB_BYTES + 96)) {
        const uint8_t *blobs = data;
        const uint8_t *cs = data + BATCH_N * BLOB_BYTES;
        const uint8_t *ps = cs + BATCH_N * 48;
        verify_blob_kzg_proof_batch(&ok, (const Blob *)blobs,
                                    (const Bytes48 *)cs, (const Bytes48 *)ps,
                                    BATCH_N, &settings);
    }
}

int LLVMFuzzerTestOneInput(const uint8_t *data, size_t size) {
    init_once();
#if defined(FUZZ_TARGET) && FUZZ_TARGET == 0
    t_blob_to_kzg_commitment(data, size);
#elif defined(FUZZ_TARGET) && FUZZ_TARGET == 1
    t_compute_kzg_proof(data, size);
#elif defined(FUZZ_TARGET) && FUZZ_TARGET == 2
    t_compute_blob_kzg_proof(data, size);
#elif defined(FUZZ_TARGET) && FUZZ_TARGET == 3
    t_verify_kzg_proof(data, size);
#elif defined(FUZZ_TARGET) && FUZZ_TARGET == 4
    t_verify_blob_kzg_proof(data, size);
#elif defined(FUZZ_TARGET) && FUZZ_TARGET == 5
    t_verify_blob_kzg_proof_batch(data, size);
#else
    /* combined harness: first byte dispatches */
    if (size < 1) return 0;
    switch (data[0] % 6) {
    case 0: t_blob_to_kzg_commitment(data + 1, size - 1); break;
    case 1: t_compute_kzg_proof(data + 1, size - 1); break;
    case 2: t_compute_blob_kzg_proof(data + 1, size - 1); break;
    case 3: t_verify_kzg_proof(data + 1, size - 1); break;
    case 4: t_verify_blob_kzg_proof(data + 1, size - 1); break;
    case 5: t_verify_blob_kzg_proof_batch(data + 1, size - 1); break;
    }
#endif
    return 0;
}

#ifdef STANDALONE_REPLAY
/* Corpus-replay driver for toolchains without libFuzzer (gcc): feeds
 * every file argument through the harness plus a deterministic mutation
 * sweep (bit flips / truncations). CI smoke uses this. */
int main(int argc, char **argv) {
    int n = 0;
    for (int i = 1; i < argc; i++) {
        FILE *f = fopen(argv[i], "rb");
        if (!f) continue;
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        uint8_t *buf = (uint8_t *)malloc(sz > 0 ? (size_t)sz : 1);
        if (fread(buf, 1, (size_t)sz, f) == (size_t)sz) {
            LLVMFuzzerTestOneInput(buf, (size_t)sz);
            for (int k = 0; k < 16 && sz > 0; k++) { /* mutations */
                uint8_t *m = (uint8_t *)malloc((size_t)sz);
                memcpy(m, buf, (size_t)sz);
                m[(k * 2654435761u) % sz] ^= (uint8_t)(1u << (k & 7));
                LLVMFuzzerTestOneInput(m, (size_t)sz);
                LLVMFuzzerTestOneInput(m, (size_t)(sz - 1 - (k % sz)));
                free(m);
            }
            n++;
        }
        free(buf);
        fclose(f);
    }
    fprintf(stderr, "replayed %d corpus files\n", n);
    return 0;
}
#endif
