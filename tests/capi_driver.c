/* Minimal C client of the libsrcnn_tpu C ABI (native/capi.cpp) — the
 * same usage shape as the reference test app's ProcessSRCNN call
 * (`test.cpp:653-672`): configure the filter, process a raw RGB buffer,
 * write the result and conv map to files.
 *
 * Usage: capi_driver <raw_rgb_in> <w> <h> <d> <multiply> <filter>
 *                    <out_file> <conv_file>
 * Exit code: 0 on success, the (negated) ProcessSRCNN code otherwise.
 */
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../native/libsrcnn_tpu_c.h"

static int write_all(const char* path, const unsigned char* p, unsigned n) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    size_t w = fwrite(p, 1, n, f);
    fclose(f);
    return w != n;
}

struct job { const unsigned char* in; unsigned w, h, d; float m;
             const unsigned char* want; unsigned wantsz; int ok; };

static void* worker(void* p) {
    struct job* j = p;
    unsigned char* out = NULL;
    unsigned outsz = 0;
    int rc = ProcessSRCNN(j->in, j->w, j->h, j->d, j->m,
                          &out, &outsz, NULL, NULL);
    j->ok = rc == 0 && outsz == j->wantsz && !memcmp(out, j->want, outsz);
    SRCNN_FreeBuffer(out);
    return NULL;
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

    /* error-code probes first: must return reference codes, not crash
     * (`libsrcnn.cpp:951-966`) */
    unsigned char* ob = NULL;
    unsigned obsz = 0;
    if (ProcessSRCNN(in, 0, h, d, multiply, &ob, &obsz, NULL, NULL) != -1) {
        fprintf(stderr, "zero-width probe did not return -1\n");
        return 2;
    }
    if (ProcessSRCNN(in, w, h, d, -2.0f, &ob, &obsz, NULL, NULL) != -2) {
        fprintf(stderr, "negative-scale probe did not return -2\n");
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

    /* concurrency probe: two worker threads re-run the same call; the
     * library serializes them internally and each must reproduce the
     * main thread's bytes (also exercises GIL hand-off to non-main
     * threads in the embedded interpreter) */
    struct job jobs[2];
    pthread_t tid[2];
    for (int t = 0; t < 2; ++t) {
        jobs[t] = (struct job){in, w, h, d, multiply, ob, obsz, 0};
        if (pthread_create(&tid[t], NULL, worker, &jobs[t])) return 2;
    }
    for (int t = 0; t < 2; ++t) pthread_join(tid[t], NULL);
    if (!jobs[0].ok || !jobs[1].ok) {
        fprintf(stderr, "threaded ProcessSRCNN mismatch\n");
        return 2;
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
