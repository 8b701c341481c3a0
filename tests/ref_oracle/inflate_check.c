/* Reference-oracle harness: decode a raw DEFLATE stream with the
 * reference's inflate() (reference src/inflate.c, compiled unmodified)
 * and compare against an expected-output file.  Exit 0 iff bit-exact.
 *
 * Usage: inflate_check <stream.bin> <expected.bin>
 *
 * Used by the encoder tests: streams produced by debigulator_tpu's
 * DEFLATE encoder must decode bit-exactly under the reference decoder
 * (SURVEY §2 #11 gate).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "inflate.h"

static void *my_malloc(uint64_t n) { return malloc(n); }

static uint8_t *read_file(const char *path, uint64_t *size_out) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    /* +16 zeroed slack: the reference's bit reader peeks up to 4 bytes
     * past the logical stream end (inflate.c peek_bits), as in its gzip
     * flow where the footer follows the payload in the same buffer. */
    uint8_t *buf = calloc(1, sz + 16);
    if (fread(buf, 1, sz, f) != (size_t)sz) { perror("fread"); exit(2); }
    fclose(f);
    *size_out = (uint64_t)sz;
    return buf;
}

int main(int argc, char **argv) {
    if (argc != 3) { fprintf(stderr, "usage: %s stream expected\n", argv[0]); return 2; }
    uint64_t stream_size, expected_size;
    uint8_t *stream = read_file(argv[1], &stream_size);
    uint8_t *expected = read_file(argv[2], &expected_size);

    inflate_init(my_malloc,
                 (void *(*)(void *, int, uint64_t))memset,
                 (void *(*)(void *, const void *, uint64_t))memcpy,
                 0);

    uint64_t cap = expected_size + 1024;
    uint8_t *recipient = malloc(cap);
    uint64_t final_size = 0;
    uint64_t work_size = 64 * 1024 * 1024;
    uint8_t *work = malloc(work_size);
    uint32_t good = 0;
    inflate(recipient, cap, &final_size, work, work_size,
            stream, stream_size, &good, 0);
    if (!good) { fprintf(stderr, "reference inflate: good=0\n"); return 1; }
    /* The reference does not reliably set final_size on all paths; compare
     * by expected length. */
    if (memcmp(recipient, expected, expected_size) != 0) {
        fprintf(stderr, "output mismatch\n");
        return 1;
    }
    printf("OK %llu bytes\n", (unsigned long long)expected_size);
    return 0;
}
