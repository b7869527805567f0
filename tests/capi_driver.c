/* Minimal C client of the libsrcnn_tpu C ABI (native/capi.cpp) — the
 * same usage shape as the reference test app's ProcessSRCNN call
 * (`test.cpp:653-672`): configure the filter, process a raw RGB buffer,
 * write the result and conv map to files.
 *
 * Usage: capi_driver <raw_rgb_in> <w> <h> <d> <multiply> <filter>
 *                    <out_file> <conv_file>
 * Exit code: 0 on success, the (negated) ProcessSRCNN code otherwise.
 */
#include <stdio.h>
#include <stdlib.h>

#include "../native/libsrcnn_tpu_c.h"

static int write_all(const char* path, const unsigned char* p, unsigned n) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    size_t w = fwrite(p, 1, n, f);
    fclose(f);
    return w != n;
}

int main(int argc, char** argv) {
    if (argc != 9) {
        fprintf(stderr, "usage: %s raw w h d multiply filter out conv\n", argv[0]);
        return 2;
    }
    unsigned w = (unsigned)strtoul(argv[2], NULL, 10);
    unsigned h = (unsigned)strtoul(argv[3], NULL, 10);
    unsigned d = (unsigned)strtoul(argv[4], NULL, 10);
    float multiply = strtof(argv[5], NULL);
    int filter = atoi(argv[6]);

    if (SRCNN_Version() != 0x00010A28u) {
        fprintf(stderr, "unexpected version constant\n");
        return 2;
    }

    size_t n = (size_t)w * h * d;
    unsigned char* in = malloc(n);
    if (!in) return 2;
    FILE* f = fopen(argv[1], "rb");
    if (!f || fread(in, 1, n, f) != n) {
        fprintf(stderr, "cannot read %zu bytes from %s\n", n, argv[1]);
        return 2;
    }
    fclose(f);

    /* negative-geometry probe first: must return -1, not crash */
    unsigned char* ob = NULL;
    unsigned obsz = 0;
    if (ProcessSRCNN(in, 0, h, d, multiply, &ob, &obsz, NULL, NULL) != -1) {
        fprintf(stderr, "zero-width probe did not return -1\n");
        return 2;
    }

    ConfigureFilterSRCNN(filter, 0);
    unsigned char* cb = NULL;
    unsigned cbsz = 0;
    int rc = ProcessSRCNN(in, w, h, d, multiply, &ob, &obsz, &cb, &cbsz);
    if (rc != 0) {
        fprintf(stderr, "ProcessSRCNN failed: %d\n", rc);
        return -rc;
    }
    if (write_all(argv[7], ob, obsz) || write_all(argv[8], cb, cbsz)) {
        return 2;
    }
    printf("ok out=%u conv=%u\n", obsz, cbsz);
    SRCNN_FreeBuffer(ob);
    SRCNN_FreeBuffer(cb);
    free(in);
    return 0;
}
