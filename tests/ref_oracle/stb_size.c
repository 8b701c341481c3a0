/* Reference-encoder size oracle: run the vendored stb_image_write
 * (reference src/stb_write.h, compiled unmodified) on our inputs and
 * print the encoded size, so encoder tests can gate "ours <= stb"
 * per input instead of against hardcoded constants (SURVEY §2 #11).
 *
 * Usage:
 *   stb_size png  <rgba.bin> <width> <height>   -> stbi_write_png_to_mem size
 *   stb_size zlib <data.bin>                    -> stbi_zlib_compress size
 *
 * Prints one decimal number (the byte size) on stdout; exit 0 on success.
 */
#define STB_IMAGE_WRITE_IMPLEMENTATION
#include "stb_write.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned char *read_file(const char *path, long *size_out) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    unsigned char *buf = malloc(sz ? sz : 1);
    if (sz && fread(buf, 1, sz, f) != (size_t)sz) { perror("fread"); exit(2); }
    fclose(f);
    *size_out = sz;
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: stb_size png|zlib ...\n"); return 2; }
    long n = 0;
    unsigned char *data = read_file(argv[2], &n);
    if (strcmp(argv[1], "png") == 0) {
        if (argc != 5) { fprintf(stderr, "png needs w h\n"); return 2; }
        int w = atoi(argv[3]), h = atoi(argv[4]);
        if ((long)w * h * 4 != n) { fprintf(stderr, "rgba size mismatch\n"); return 2; }
        int out_len = 0;
        unsigned char *png = stbi_write_png_to_mem(data, w * 4, w, h, 4, &out_len);
        if (!png || out_len <= 0) { fprintf(stderr, "stb png encode failed\n"); return 1; }
        printf("%d\n", out_len);
        return 0;
    }
    if (strcmp(argv[1], "zlib") == 0) {
        int out_len = 0;
        unsigned char *z = stbi_zlib_compress(data, (int)n, &out_len,
                                              stbi_write_png_compression_level);
        if (!z || out_len <= 0) { fprintf(stderr, "stb zlib failed\n"); return 1; }
        printf("%d\n", out_len);
        return 0;
    }
    fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 2;
}
