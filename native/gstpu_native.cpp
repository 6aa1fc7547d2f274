// gstpu native runtime support library.
//
// Native equivalents for byte-plumbing hot paths the reference keeps
// in compiled code (SURVEY.md §2.9): G.711 A-law/mu-law transcoding,
// CRC32/CRC32C, and scatter/gather byte interleaving used by the
// muxers. Exposed through a minimal C ABI consumed via ctypes
// (gstpu/native.py), with pure-Python fallbacks when the .so is
// missing.

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------------
// G.711 (ITU-T) A-law / mu-law
// ---------------------------------------------------------------------------

// Classic ITU-T G.711 segmented companding (the Sun g711.c algorithm,
// re-derived from the spec's segment tables).

static inline int g711_segment(int val, const int16_t* table, int n) {
    for (int i = 0; i < n; i++)
        if (val <= table[i]) return i;
    return n;
}

static const int16_t seg_aend[8] = {0x1F, 0x3F, 0x7F, 0xFF,
                                    0x1FF, 0x3FF, 0x7FF, 0xFFF};
static const int16_t seg_uend[8] = {0x3F, 0x7F, 0xFF, 0x1FF,
                                    0x3FF, 0x7FF, 0xFFF, 0x1FFF};

static inline uint8_t linear_to_alaw(int16_t pcm) {
    int v = pcm >> 3;  // 13-bit magnitude domain
    uint8_t mask;
    if (v >= 0) {
        mask = 0xD5;
    } else {
        mask = 0x55;
        v = -v - 1;
    }
    int seg = g711_segment(v, seg_aend, 8);
    if (seg >= 8) return (uint8_t)(0x7F ^ mask);
    uint8_t aval = (uint8_t)(seg << 4);
    if (seg < 2)
        aval |= (v >> 1) & 0x0F;
    else
        aval |= (v >> seg) & 0x0F;
    return aval ^ mask;
}

static inline int16_t alaw_to_linear(uint8_t a) {
    a ^= 0x55;
    int t = (a & 0x0F) << 4;
    int seg = (a & 0x70) >> 4;
    switch (seg) {
        case 0: t += 8; break;
        case 1: t += 0x108; break;
        default: t += 0x108; t <<= seg - 1;
    }
    return (int16_t)((a & 0x80) ? t : -t);
}

static inline uint8_t linear_to_mulaw(int16_t pcm) {
    const int BIAS = 0x84;  // 132 in the 14-bit domain
    int v = pcm >> 2;       // 14-bit domain
    uint8_t mask;
    if (v < 0) {
        v = -v;
        mask = 0x7F;
    } else {
        mask = 0xFF;
    }
    if (v > 8159) v = 8159;
    v += BIAS >> 2;  // +33
    int seg = g711_segment(v, seg_uend, 8);
    if (seg >= 8) return (uint8_t)(0x7F ^ mask);
    uint8_t uval = (uint8_t)((seg << 4) | ((v >> (seg + 1)) & 0x0F));
    return uval ^ mask;
}

static inline int16_t mulaw_to_linear(uint8_t u) {
    u = ~u;
    int t = ((u & 0x0F) << 3) + 0x84;
    t <<= (u & 0x70) >> 4;
    t -= 0x84;  // segment shifts already place this on the 16-bit scale
    return (int16_t)((u & 0x80) ? -t : t);
}

void gstpu_alaw_encode(const int16_t* in, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = linear_to_alaw(in[i]);
}

void gstpu_alaw_decode(const uint8_t* in, int16_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = alaw_to_linear(in[i]);
}

void gstpu_mulaw_encode(const int16_t* in, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = linear_to_mulaw(in[i]);
}

void gstpu_mulaw_decode(const uint8_t* in, int16_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = mulaw_to_linear(in[i]);
}

// ---------------------------------------------------------------------------
// CRC32 (zlib polynomial) and CRC32C (Castagnoli)
// ---------------------------------------------------------------------------

static uint32_t crc_table[2][256];
static bool crc_init_done = false;

static void crc_init() {
    if (crc_init_done) return;
    const uint32_t polys[2] = {0xEDB88320u, 0x82F63B78u};
    for (int t = 0; t < 2; t++) {
        for (uint32_t i = 0; i < 256; i++) {
            uint32_t c = i;
            for (int k = 0; k < 8; k++)
                c = (c & 1) ? polys[t] ^ (c >> 1) : c >> 1;
            crc_table[t][i] = c;
        }
    }
    crc_init_done = true;
}

uint32_t gstpu_crc32(const uint8_t* data, size_t n, uint32_t seed) {
    crc_init();
    uint32_t c = seed ^ 0xFFFFFFFFu;
    for (size_t i = 0; i < n; i++)
        c = crc_table[0][(c ^ data[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

uint32_t gstpu_crc32c(const uint8_t* data, size_t n, uint32_t seed) {
    crc_init();
    uint32_t c = seed ^ 0xFFFFFFFFu;
    for (size_t i = 0; i < n; i++)
        c = crc_table[1][(c ^ data[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// gather copy: concatenate N (ptr, len) chunks into dst
// ---------------------------------------------------------------------------

size_t gstpu_gather(const uint8_t** ptrs, const size_t* lens, size_t n,
                    uint8_t* dst) {
    size_t off = 0;
    for (size_t i = 0; i < n; i++) {
        memcpy(dst + off, ptrs[i], lens[i]);
        off += lens[i];
    }
    return off;
}

// interleave n_src equally-sized sample streams (frame_size bytes per
// sample) into dst: dst[(i*n_src + s)*frame_size ...] = src[s][i*...]
void gstpu_interleave(const uint8_t** srcs, size_t n_src,
                      size_t n_samples, size_t sample_size,
                      uint8_t* dst) {
    for (size_t i = 0; i < n_samples; i++)
        for (size_t s = 0; s < n_src; s++)
            memcpy(dst + (i * n_src + s) * sample_size,
                   srcs[s] + i * sample_size, sample_size);
}

}  // extern "C"
