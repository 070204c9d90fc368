/* Test-only shim: exposes the *upstream reference* encoder/decoder through a
 * stable C ABI so the test-suite can cross-validate seqoia_tpu's independent
 * implementations against the genuine article.
 *
 * The reference header is included from its read-only mount path at build
 * time (see tests/conftest.py); no reference code is vendored into this
 * repository. If the mount is absent the tests that need this shim skip.
 */

/* The reference's worst-case encode buffer is 1 byte short (its max_size
 * formula omits the start byte), so pad every allocation to keep the probe
 * process's heap intact on adversarial inputs. */
#include <stdlib.h>
#define SQOA_MALLOC(sz) malloc((sz) + 64)
#define SQOA_FREE(p) free(p)

#define SQOA_IMPLEMENTATION
#define SQOA_NO_STDIO
#include SQOA_REFERENCE_HEADER

#include <stdint.h>
#include <string.h>

int64_t ref_encode(const uint8_t *pixels, uint32_t width, uint32_t height,
                   int channels, int colorspace, int qoi_compat,
                   uint8_t *out, int64_t out_cap) {
    sqoa_desc d;
    d.width = width;
    d.height = height;
    d.channels = (unsigned char)channels;
    d.colorspace = (unsigned char)colorspace;
    d.qoi_compat = (unsigned char)qoi_compat;
    int len = 0;
    void *enc = sqoa_encode(pixels, &d, &len);
    if (!enc) return -1;
    if (len > out_cap) { SQOA_FREE(enc); return -2; }
    memcpy(out, enc, len);
    SQOA_FREE(enc);
    return len;
}

int64_t ref_decode(const uint8_t *data, int64_t size, int channels,
                   uint8_t *out, int64_t out_cap, uint32_t desc_out[5]) {
    sqoa_desc d;
    memset(&d, 0, sizeof d);
    void *pix = sqoa_decode(data, (int)size, &d, channels);
    if (!pix) return -1;
    int out_ch = channels;
    if (out_ch == 0) {
        int colch = d.channels < 3 ? 1 : 3;
        out_ch = colch + ((d.channels & 1) == 0);
    }
    int64_t n = (int64_t)d.width * d.height * out_ch;
    if (n > out_cap) { SQOA_FREE(pix); return -2; }
    memcpy(out, pix, n);
    SQOA_FREE(pix);
    desc_out[0] = d.width;
    desc_out[1] = d.height;
    desc_out[2] = d.channels;
    desc_out[3] = d.colorspace;
    desc_out[4] = d.qoi_compat;
    return n;
}
