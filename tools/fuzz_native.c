/* Sanitizer-hardened fuzz driver for the native runtime (sqoa_native.c).
 *
 * The reference fuzzes its decoder under clang libFuzzer + ASan
 * (reference: sqoafuzz.c:10,20-32). This toolchain has no libFuzzer, so
 * this is a self-contained mutation driver with the same coverage goals,
 * built with gcc -fsanitize=address,undefined (make fuzz-asan):
 *
 *   - seed corpus: valid streams in every mode combo (sqoa/qoi x rgb/rgba
 *     x mono), hand-built SQOA_OP_REF replay streams (the cursor-teleport
 *     path, sqoa_native.c cur_next/sqn_decode; reference seqoia.h:729-738),
 *     truncated-RGBA tails, alpha-modifier trains, mono-compat headers
 *     (the decoder-only 128-entry-index quirk, seqoia.h:690-693);
 *   - mutations: byte writes, bit flips, truncation, extension, cross-seed
 *     splices, targeted header-field rewrites (dims/channels/colorspace/
 *     magic/start byte) and op-tag injections biased toward the REF
 *     (<0x60) and alpha ([0x60,0x80)) ranges;
 *   - per exec, the production call contract (native/__init__.py):
 *     sqn_peek_header -> exact-size output malloc -> sqn_decode with a
 *     random force_channels in 0..4 (plus out-of-range values that must be
 *     rejected), and sqn_scan_chunks with random chunk counts into an
 *     exact-size table. Exact-size heap allocations give ASan redzones on
 *     both the stream tail and the pixel output.
 *   - on seeds that survive un-mutated, a decode(encode(x)) self-check
 *     keeps the driver honest about the valid path too.
 *
 * Any sanitizer report aborts the process (-fno-sanitize-recover).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../seqoia_tpu/native/sqoa_native.c"

/* ---- rng ----------------------------------------------------------------*/
static uint64_t rng_state = 0x9e3779b97f4a7c15ull;
static uint64_t rnd64(void) {
    uint64_t x = rng_state;
    x ^= x << 13;
    x ^= x >> 7;
    x ^= x << 17;
    return rng_state = x;
}
static uint32_t rnd(uint32_t n) { return (uint32_t)(rnd64() % n); }

/* ---- seed corpus --------------------------------------------------------*/
typedef struct {
    uint8_t *data;
    int64_t size;
} seed_t;

#define MAX_SEEDS 64
static seed_t seeds[MAX_SEEDS];
static int n_seeds = 0;

static void add_seed(const uint8_t *data, int64_t size) {
    if (n_seeds >= MAX_SEEDS || size <= 0) return;
    seeds[n_seeds].data = (uint8_t *)malloc((size_t)size);
    memcpy(seeds[n_seeds].data, data, (size_t)size);
    seeds[n_seeds].size = size;
    n_seeds++;
}

static void gen_pixels(uint8_t *px, int64_t n, int kind) {
    for (int64_t i = 0; i < n; i++) {
        switch (kind) {
        case 0: px[i] = (uint8_t)rnd(256); break;               /* noise */
        case 1: px[i] = (uint8_t)((i / 97) & 0xff); break;      /* runs  */
        case 2: px[i] = (uint8_t)(128 + (int)rnd(5) - 2); break;/* luma  */
        default: px[i] = (uint8_t)((i % 5) * 50); break;        /* palette */
        }
    }
}

static void seed_encoded(void) {
    /* valid streams: every (channels, compat) combo the encoder accepts */
    static const int combos[][2] = {
        {3, 0}, {4, 0}, {1, 0}, {2, 0}, {3, 1}, {4, 1}, {5, 0}, {6, 0},
    };
    uint8_t *px = (uint8_t *)malloc(64 * 48 * 4);
    uint8_t *out = (uint8_t *)malloc(64 * 48 * 5 + 64);
    for (unsigned k = 0; k < sizeof(combos) / sizeof(combos[0]); k++) {
        int ch = combos[k][0], compat = combos[k][1];
        int colch = ch < 3 ? 1 : 3;
        int stride = colch + ((ch & 1) == 0);
        for (int kind = 0; kind < 4; kind++) {
            gen_pixels(px, 64 * 48 * stride, kind);
            int64_t n = sqn_encode(px, 64, 48, ch, 0, compat, out);
            if (n > 0) add_seed(out, n);
        }
    }
    free(px);
    free(out);
}

static int64_t put_header(uint8_t *p, uint32_t magic, uint32_t w, uint32_t h,
                          int ch, int cs, int start_byte) {
    put_be32(p, magic);
    put_be32(p + 4, w);
    put_be32(p + 8, h);
    p[12] = (uint8_t)ch;
    p[13] = (uint8_t)cs;
    int64_t n = 14;
    if (start_byte >= 0) p[n++] = (uint8_t)start_byte;
    return n;
}

static void seed_handcrafted(void) {
    uint8_t buf[512];
    int64_t n;

    /* REF replay streams (decode-only feature: never encoder-emitted,
     * reference seqoia.h:729-738). LUMA pairs then REF bytes covering
     * every length code and several window offsets, including offset 0
     * and a REF whose replay lands on another REF's bytes. */
    for (int variant = 0; variant < 6; variant++) {
        n = put_header(buf, 0x53716f61u /* Sqoa */, 16, 4, 3, 0, 0x31);
        for (int i = 0; i < 8; i++) { /* 8 LUMA color ops */
            buf[n++] = (uint8_t)(0x80 | (0x20 + i));
            buf[n++] = (uint8_t)(0x88 + i);
        }
        switch (variant) {
        case 0: buf[n++] = (uint8_t)(0x00 | 1); break;  /* len 2, off 1 */
        case 1: buf[n++] = (uint8_t)(0x20 | 4); break;  /* len 3, off 4 */
        case 2: buf[n++] = (uint8_t)(0x40 | 15); break; /* len 4, off 15 */
        case 3: buf[n++] = (uint8_t)(0x00 | 0); break;  /* off 0 edge */
        case 4: /* chained refs */
            buf[n++] = (uint8_t)(0x00 | 2);
            buf[n++] = (uint8_t)(0x20 | 6);
            break;
        case 5: /* ref pointing at/into the header (negative start guard) */
            buf[n++] = (uint8_t)(0x40 | 31);
            break;
        }
        buf[n++] = 0xfd; /* trailing BIGRUN */
        memset(buf + n, 0, 7);
        n += 7;
        buf[n++] = 1;
        add_seed(buf, n);
    }

    /* truncated-RGBA tail: stream ends mid-op, cursor walks into padding */
    n = put_header(buf, 0x53716f61u, 8, 8, 4, 0, 0x31);
    buf[n++] = 0xff; /* RGBA tag, then only 2 of 4 value bytes */
    buf[n++] = 0x12;
    buf[n++] = 0x34;
    memset(buf + n, 0, 7);
    n += 7;
    buf[n++] = 1;
    add_seed(buf, n);

    /* alpha-modifier train after a RUN (alpha-peek path) */
    n = put_header(buf, 0x53716f61u, 32, 2, 4, 0, 0x31);
    buf[n++] = 0xfe; buf[n++] = 9; buf[n++] = 8; buf[n++] = 7;
    for (int i = 0; i < 12; i++) buf[n++] = (uint8_t)(0x60 + (i * 3) % 32);
    buf[n++] = 0xc5;
    buf[n++] = (uint8_t)(0x60 + 17);
    memset(buf + n, 0, 7);
    n += 7;
    buf[n++] = 1;
    add_seed(buf, n);

    /* mono-compat: decoder-only quirk (128-entry index, unreachable from
     * the encoder — seqoia.h:477-480,690-693) */
    n = put_header(buf, 0x716f6966u /* qoif */, 16, 3, 1, 0, -1);
    for (int i = 0; i < 10; i++) buf[n++] = (uint8_t)(0x40 + i * 7);
    buf[n++] = 0x7f; /* INDEX at the widened 7-bit range edge */
    memset(buf + n, 0, 7);
    n += 7;
    buf[n++] = 1;
    add_seed(buf, n);

    /* minimal/degenerate: header + padding only */
    n = put_header(buf, 0x53716f61u, 1, 1, 3, 0, 0x31);
    memset(buf + n, 0, 7);
    n += 7;
    buf[n++] = 1;
    add_seed(buf, n);
}

/* ---- one exec -----------------------------------------------------------*/
#define MAX_PX ((int64_t)1 << 22) /* cap accepted dims: alloc-bound, not
                                     validation-bound (huge dims are still
                                     fed through the reject path) */

static uint64_t execs = 0, accepted = 0, scan_ok = 0;

static void run_one(const uint8_t *data, int64_t size) {
    execs++;
    /* exact-size copy: ASan redzones the stream tail */
    uint8_t *buf = (uint8_t *)malloc((size_t)(size > 0 ? size : 1));
    memcpy(buf, data, (size_t)size);

    uint32_t desc[5];
    int rc = sqn_peek_header(buf, size, desc);
    if (rc == 0) {
        int64_t npx = (int64_t)desc[0] * desc[1];
        int force = (int)rnd(6) - 1; /* -1..4: out-of-range must reject */
        if (npx <= MAX_PX) {
            int colch = desc[2] < 3 ? 1 : 3;
            int out_ch = force > 0
                ? force
                : colch + ((desc[2] & 1) == 0 ? 1 : 0);
            uint8_t *out = (uint8_t *)malloc((size_t)(npx * out_ch + 1));
            int64_t n = sqn_decode(buf, size, force, out, NULL);
            if (n > 0) accepted++;
            free(out);
        } /* npx in (MAX_PX, 400e6): valid but alloc-heavy — skipped; the
             >= 400e6 reject path is pinned by a directed test in main() */
    }

    int n_chunks = 1 + (int)rnd(17);
    int64_t *tbl = (int64_t *)malloc(sizeof(int64_t) * 4 * (size_t)n_chunks);
    if (sqn_scan_chunks(buf, size, n_chunks, tbl) == 0) scan_ok++;
    free(tbl);
    free(buf);
}

/* ---- mutation -----------------------------------------------------------*/
static void mutate(uint8_t *buf, int64_t *size, int64_t cap) {
    int rounds = 1 + (int)rnd(8);
    for (int r = 0; r < rounds; r++) {
        switch (rnd(8)) {
        case 0: /* random byte */
            buf[rnd((uint32_t)*size)] = (uint8_t)rnd(256);
            break;
        case 1: /* bit flip */
            buf[rnd((uint32_t)*size)] ^= (uint8_t)(1u << rnd(8));
            break;
        case 2: /* truncate */
            if (*size > 1) *size = 1 + (int64_t)rnd((uint32_t)(*size - 1));
            break;
        case 3: /* extend with noise */
            while (*size < cap && rnd(4)) buf[(*size)++] = (uint8_t)rnd(256);
            break;
        case 4: /* op-tag injection biased to REF/alpha/8-bit tags */
            {
                static const uint8_t tags[] = {0x00, 0x1f, 0x21, 0x45,
                                               0x5f, 0x60, 0x7f, 0x80,
                                               0xc0, 0xfc, 0xfd, 0xfe,
                                               0xff};
                buf[rnd((uint32_t)*size)] = tags[rnd(sizeof(tags))];
            }
            break;
        case 5: /* header field rewrite (dims kept mostly small) */
            if (*size >= 15) {
                switch (rnd(5)) {
                case 0: put_be32(buf + 4, 1 + rnd(2048)); break;
                case 1: put_be32(buf + 8, 1 + rnd(2048)); break;
                case 2: buf[12] = (uint8_t)rnd(8); break;
                case 3: buf[13] = (uint8_t)rnd(3); break;
                case 4: buf[14] = rnd(2) ? 0x31 : (uint8_t)rnd(256); break;
                }
            }
            break;
        case 6: /* occasionally huge dims: must hit the 400 Mpx reject */
            if (*size >= 12 && rnd(8) == 0) {
                put_be32(buf + 4, 20000 + rnd(1u << 16));
                put_be32(buf + 8, 20000 + rnd(1u << 16));
            }
            break;
        case 7: /* splice a window from another seed */
            {
                const seed_t *s = &seeds[rnd((uint32_t)n_seeds)];
                if (s->size > 2 && *size > 2) {
                    int64_t w = 1 + (int64_t)rnd((uint32_t)(s->size - 1));
                    int64_t dst = (int64_t)rnd((uint32_t)*size);
                    if (w > *size - dst) w = *size - dst;
                    int64_t src = (int64_t)rnd((uint32_t)(s->size - w + 1));
                    memcpy(buf + dst, s->data + src, (size_t)w);
                }
            }
            break;
        }
    }
}

/* decode(encode(x)) self-check on a fresh random image (valid path) */
static void roundtrip_check(void) {
    static const int chs[] = {1, 2, 3, 4};
    int ch = chs[rnd(4)];
    int compat = (ch >= 3) ? (int)rnd(2) : 0;
    uint32_t w = 1 + rnd(96), h = 1 + rnd(64);
    int colch = ch < 3 ? 1 : 3;
    int stride = colch + ((ch & 1) == 0);
    int64_t npx = (int64_t)w * h;
    uint8_t *px = (uint8_t *)malloc((size_t)(npx * stride));
    gen_pixels(px, npx * stride, (int)rnd(4));
    int64_t cap = npx * (stride + 1) + 64;
    uint8_t *enc = (uint8_t *)malloc((size_t)cap);
    int64_t n = sqn_encode(px, w, h, ch, 0, compat, enc);
    if (n <= 0) {
        fprintf(stderr, "valid encode rejected (ch=%d compat=%d)\n", ch,
                compat);
        abort();
    }
    uint8_t *dec = (uint8_t *)malloc((size_t)(npx * stride));
    int64_t m = sqn_decode(enc, n, 0, dec, NULL);
    if (m != npx * stride || memcmp(px, dec, (size_t)m) != 0) {
        fprintf(stderr, "roundtrip mismatch (ch=%d compat=%d)\n", ch,
                compat);
        abort();
    }
    free(px);
    free(enc);
    free(dec);
}

int main(int argc, char **argv) {
    uint64_t iters = argc > 1 ? strtoull(argv[1], NULL, 10) : 200000;
    if (argc > 2) rng_state ^= strtoull(argv[2], NULL, 10);

    seed_encoded();
    seed_handcrafted();
    fprintf(stderr, "fuzz_native: %d seeds, %llu iters\n", n_seeds,
            (unsigned long long)iters);

    /* directed: the 400 Mpx cap must reject inside sqn_decode itself
     * (seqoia.h:428-432; peek normally screens it out first) */
    {
        uint8_t hdr[23];
        int64_t n = put_header(hdr, 0x53716f61u, 20000, 20000, 3, 0, 0x31);
        memset(hdr + n, 0, 7);
        n += 7;
        hdr[n++] = 1;
        uint8_t tiny[8];
        if (sqn_decode(hdr, n, 0, tiny, NULL) > 0) {
            fprintf(stderr, "oversized image accepted!\n");
            abort();
        }
    }

    /* pass 0: every seed un-mutated (REF replays etc. must decode clean) */
    for (int i = 0; i < n_seeds; i++) run_one(seeds[i].data, seeds[i].size);

    int64_t cap = 4096;
    uint8_t *work = (uint8_t *)malloc((size_t)cap);
    for (uint64_t it = 0; it < iters; it++) {
        const seed_t *s = &seeds[rnd((uint32_t)n_seeds)];
        int64_t size = s->size < cap ? s->size : cap;
        memcpy(work, s->data, (size_t)size);
        mutate(work, &size, cap);
        run_one(work, size);
        if ((it & 0xfff) == 0) roundtrip_check();
        if ((it + 1) % 100000 == 0)
            fprintf(stderr, "  %llu execs (%llu decoded, %llu scanned)\n",
                    (unsigned long long)execs, (unsigned long long)accepted,
                    (unsigned long long)scan_ok);
    }
    free(work);
    fprintf(stderr,
            "fuzz_native: clean. %llu execs, %llu decode-accepted, "
            "%llu scan-accepted\n",
            (unsigned long long)execs, (unsigned long long)accepted,
            (unsigned long long)scan_ok);
    return 0;
}
