/*
 * libFuzzer harness for the C ABI (capi/liblambdaworks_kzg_tpu.so).
 *
 * Mirrors the reference's fuzz targets (reference fuzz/<fn>/fuzz.c,
 * sizes per fuzz/Makefile:64-86): the setup loads once per process
 * (reference fuzz/base_fuzz.h:17-34), each input is size-gated and
 * dispatched to one entry point by its first byte.
 *
 * Build (clang with libFuzzer):
 *   make -C capi
 *   clang -fsanitize=fuzzer -I../capi fuzz_capi.c \
 *         -L../capi -llambdaworks_kzg_tpu -o fuzz_capi
 *   LD_LIBRARY_PATH=../capi PYTHONPATH=.. ./fuzz_capi
 */
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "lambdaworks_kzg_tpu.h"

#ifndef TRUSTED_SETUP_PATH
#define TRUSTED_SETUP_PATH "/root/reference/tests/trusted_setup_4.txt"
#endif
#define N_FIELD 4
#define BLOB_BYTES (N_FIELD * 32)

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

int LLVMFuzzerTestOneInput(const uint8_t *data, size_t size) {
    init_once();
    if (size < 1) return 0;
    uint8_t which = data[0] % 6;
    data++; size--;

    Bytes48 out48; Bytes32 out32; bool ok;
    switch (which) {
    case 0: /* blob_to_kzg_commitment: exact blob size */
        if (size == BLOB_BYTES)
            blob_to_kzg_commitment(&out48, (const Blob *)data, &settings);
        break;
    case 1: /* compute_kzg_proof: blob || z */
        if (size == BLOB_BYTES + 32)
            compute_kzg_proof(&out48, &out32, (const Blob *)data,
                              (const Bytes32 *)(data + BLOB_BYTES), &settings);
        break;
    case 2: /* compute_blob_kzg_proof: blob || commitment */
        if (size == BLOB_BYTES + 48)
            compute_blob_kzg_proof(&out48, (const Blob *)data,
                                   (const Bytes48 *)(data + BLOB_BYTES),
                                   &settings);
        break;
    case 3: /* verify_kzg_proof: c || z || y || proof */
        if (size == 48 + 32 + 32 + 48)
            verify_kzg_proof(&ok, (const Bytes48 *)data,
                             (const Bytes32 *)(data + 48),
                             (const Bytes32 *)(data + 80),
                             (const Bytes48 *)(data + 112), &settings);
        break;
    case 4: /* verify_blob_kzg_proof: blob || c || proof */
        if (size == BLOB_BYTES + 96)
            verify_blob_kzg_proof(&ok, (const Blob *)data,
                                  (const Bytes48 *)(data + BLOB_BYTES),
                                  (const Bytes48 *)(data + BLOB_BYTES + 48),
                                  &settings);
        break;
    case 5: /* verify_blob_kzg_proof_batch, n=2 */
        if (size == 2 * (BLOB_BYTES + 96)) {
            const uint8_t *blobs = data;
            const uint8_t *cs = data + 2 * BLOB_BYTES;
            const uint8_t *ps = cs + 2 * 48;
            verify_blob_kzg_proof_batch(&ok, (const Blob *)blobs,
                                        (const Bytes48 *)cs,
                                        (const Bytes48 *)ps, 2, &settings);
        }
        break;
    }
    return 0;
}
