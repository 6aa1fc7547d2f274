// FFV1 v1 adaptive range coder — the host half of gstpu's TPU-split
// encoder (SURVEY.md §2.8 P4: codec-internal parallel compute).
//
// The data-parallel half (3-gradient context quantization, median
// prediction, residual folding) runs on the TPU as one fused JAX pass
// (gstpu/ops/ffv1_pred.py); this file consumes the resulting
// (context, residual) fields and performs the inherently sequential
// adaptive entropy coding.  Bitstreams are byte-identical to the
// pure-Python spec model (gstpu/codecs/ffv1.py) and are proven
// decodable bit-exactly by libavcodec's independent ffv1 decoder
// (tests/test_ffv1enc.py).
//
// Reference parity note: the reference wraps only a DECODER
// (video/ffv1/src/ffv1dec/imp.rs); the encoder here is gstpu's own,
// built from RFC 9043.  Nothing is transcribed from FFmpeg or the
// ffv1 crate — the state-transition tables come from the spec's
// documented recurrence, and all implicit rules were pinned against
// libavcodec empirically (see gstpu/codecs/ffv1.py docstring).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

struct StateTables {
    uint8_t one[256];
    uint8_t zero[256];
    StateTables() {
        std::memset(one, 0, sizeof(one));
        std::memset(zero, 0, sizeof(zero));
        const uint64_t kOne = 1ull << 32;
        const uint64_t factor = (uint64_t)(0.05 * (double)kOne);
        const int max_p = 256 - 8;
        uint64_t p = kOne / 2;
        int last_p8 = 0;
        for (int i = 0; i < 128; i++) {
            int p8 = (int)((256 * p + kOne / 2) >> 32);
            if (p8 <= last_p8) p8 = last_p8 + 1;
            if (last_p8 && last_p8 < 256 && p8 <= max_p)
                one[last_p8] = (uint8_t)p8;
            p += ((kOne - p) * factor + kOne / 2) >> 32;
            last_p8 = p8;
        }
        for (int i = 256 - max_p; i <= max_p; i++) {
            if (one[i]) continue;
            uint64_t q = ((uint64_t)i * kOne + 128) >> 8;
            q += ((kOne - q) * factor + kOne / 2) >> 32;
            int p8 = (int)((256 * q + kOne / 2) >> 32);
            if (p8 == i) p8++;
            if (p8 > max_p) p8 = max_p;
            one[i] = (uint8_t)p8;
        }
        for (int i = 1; i < 255; i++)
            zero[i] = (uint8_t)(256 - one[256 - i]);
    }
};

const StateTables kTab;

// one[]/zero[] fused into a bit-indexed bank so the hot path's state
// transition is a single unpredicated load: kTab2.t[bit][s]
struct StateTables2 {
    uint8_t t[2][256];
    StateTables2() {
        std::memcpy(t[1], kTab.one, 256);
        std::memcpy(t[0], kTab.zero, 256);
    }
};
const StateTables2 kTab2;

// ---- register-resident coder core -----------------------------------
// The per-sample hot path writes through uint8_t pointers (adaptive
// states, output bytes); char-typed stores may alias ANY object, so a
// member-field coder (`this->low`, `this->range`, `this->p`) is forced
// to reload its state from memory after every such store.  Keeping the
// coder state in a local struct whose address never escapes lets the
// compiler promote low/range/p to registers across the whole plane
// scan — the single biggest lever on the one-core entropy throughput
// this encoder's TPU split leaves on the host (VERDICT r4 #1).
struct Bits {
    uint32_t low;
    uint32_t range;
    uint8_t *p;
    int ob;           // outstanding_byte (-1 = none)
    uint64_t oc;      // outstanding_count
};

static inline void bits_renorm(Bits &b) {
    while (b.range < 0x100) {
        if (b.ob < 0) {
            b.ob = (int)(b.low >> 8);
        } else if (b.low <= 0xFF00) {
            *b.p++ = (uint8_t)b.ob;
            while (b.oc) { *b.p++ = 0xFF; b.oc--; }
            b.ob = (int)(b.low >> 8);
        } else if (b.low >= 0x10000) {
            *b.p++ = (uint8_t)(b.ob + 1);
            while (b.oc) { *b.p++ = 0x00; b.oc--; }
            b.ob = (int)((b.low >> 8) & 0xFF);
        } else {
            b.oc++;
        }
        b.low = (b.low & 0xFF) << 8;
        b.range <<= 8;
    }
}

static inline void bits_put(Bits &b, uint8_t *state, unsigned bit) {
    const uint32_t s = *state;
    const uint32_t r1 = (b.range * s) >> 8;
    // branchless select: low += bit ? range - r1 : 0; range = bit ? r1
    // : range - r1 — the bit stream is near-max-entropy, so a branch
    // here mispredicts constantly
    const uint32_t d = b.range - r1;
    b.low += d & (0u - bit);
    b.range = bit ? r1 : d;
    *state = kTab2.t[bit][s];
    if (__builtin_expect(b.range < 0x100, 0)) bits_renorm(b);
}

// signed 8-bit symbol (folded residual in [-128, 127]): e <= 7, so the
// spec's i<9 exponent clamps are statically dead
static inline void bits_put_symbol8(Bits &b, uint8_t *st, int v) {
    if (v == 0) { bits_put(b, st + 0, 1); return; }
    bits_put(b, st + 0, 0);
    const int a = v < 0 ? -v : v;
    const int e = 31 - __builtin_clz((unsigned)a);
    for (int i = 0; i < e; i++) bits_put(b, st + 1 + i, 1);
    bits_put(b, st + 1 + e, 0);
    for (int i = e - 1; i >= 0; i--)
        bits_put(b, st + 22 + i, (unsigned)((a >> i) & 1));
    bits_put(b, st + 11 + e, v < 0 ? 1u : 0u);
}

struct RangeEncoder {
    // raw-pointer output: `put` writes are the per-sample hot path and
    // must not pay vector capacity checks.  Caller guarantees cap via
    // grow() checks at plane granularity (worst case is bounded).
    uint8_t *buf = nullptr;
    uint8_t *p = nullptr;
    uint8_t *end = nullptr;
    std::vector<uint8_t> owned;   // backing store
    uint32_t low = 0;
    uint32_t range = 0xFF00;
    int outstanding_byte = -1;
    uint64_t outstanding_count = 0;

    void reserve(size_t n) {
        owned.resize(n);
        buf = owned.data();
        p = buf;
        end = buf + n;
    }

    inline void grow_if_needed() {
        // headroom for the worst-case bytes one sample can emit
        if (__builtin_expect(end - p < 64, 0)) {
            size_t used = (size_t)(p - buf);
            owned.resize(owned.size() * 2 + 4096);
            buf = owned.data();
            p = buf + used;
            end = buf + owned.size();
        }
    }

    void renorm() {
        while (range < 0x100) {
            if (outstanding_byte < 0) {
                outstanding_byte = (int)(low >> 8);
            } else if (low <= 0xFF00) {
                *p++ = (uint8_t)outstanding_byte;
                while (outstanding_count) {
                    grow_if_needed();
                    *p++ = 0xFF;
                    outstanding_count--;
                }
                outstanding_byte = (int)(low >> 8);
            } else if (low >= 0x10000) {
                *p++ = (uint8_t)(outstanding_byte + 1);
                while (outstanding_count) {
                    grow_if_needed();
                    *p++ = 0x00;
                    outstanding_count--;
                }
                outstanding_byte = (int)((low >> 8) & 0xFF);
            } else {
                outstanding_count++;
            }
            low = (low & 0xFF) << 8;
            range <<= 8;
            grow_if_needed();
        }
    }

    inline void put_rac(uint8_t *state, int bit) {
        uint32_t s = *state;
        uint32_t r1 = (range * s) >> 8;
        if (bit) {
            low += range - r1;
            range = r1;
            *state = kTab.one[s];
        } else {
            range -= r1;
            *state = kTab.zero[s];
        }
        if (__builtin_expect(range < 0x100, 0)) renorm();
    }

    void put_symbol(uint8_t *st, int v, bool is_signed) {
        grow_if_needed();
        if (v == 0) { put_rac(st + 0, 1); return; }
        put_rac(st + 0, 0);
        int a = v < 0 ? -v : v;
        int e = 31 - __builtin_clz((unsigned)a);
        for (int i = 0; i < e; i++) put_rac(st + 1 + (i < 9 ? i : 9), 1);
        put_rac(st + 1 + (e < 9 ? e : 9), 0);
        for (int i = e - 1; i >= 0; i--)
            put_rac(st + 22 + (i < 9 ? i : 9), (a >> i) & 1);
        if (is_signed) put_rac(st + 11 + (e < 10 ? e : 10), v < 0 ? 1 : 0);
    }

    void terminate() {
        grow_if_needed();
        range = 0xFF;
        low += 0xFF;
        renorm();
        range = 0xFF;
        renorm();
    }

    size_t size() const { return (size_t)(p - buf); }

    // ---- register-core bridging (hot plane loops run on `Bits`) ----
    Bits bits() const {
        return Bits{low, range, p, outstanding_byte, outstanding_count};
    }
    void sync(const Bits &b) {
        low = b.low;
        range = b.range;
        p = b.p;
        outstanding_byte = b.ob;
        outstanding_count = b.oc;
    }
    void grow_big(uint64_t extra) {
        size_t used = (size_t)(p - buf);
        owned.resize(owned.size() * 2 + (size_t)extra + 4096);
        buf = owned.data();
        p = buf + used;
        end = buf + owned.size();
    }
};

// per-pixel headroom check for the register core: covers the worst
// case one 8-bit symbol can emit (~34 B) plus any deferred
// outstanding-byte run that the next flush would write at once
static inline bool bits_need_grow(const Bits &b, const uint8_t *bend) {
    return __builtin_expect((uint64_t)(bend - b.p) < 64 + b.oc, 0);
}

constexpr int kCS = 32;  // CONTEXT_SIZE

struct Ffv1Enc {
    int bits, chroma, log2h, log2v;
    int32_t quant[5][256];
    int context_count;
    // two state banks: [0] luma, [1] shared by both chroma planes
    std::vector<uint8_t> states[2];

    void reset_states() {
        for (auto &b : states) {
            b.assign((size_t)context_count * kCS, 128);
        }
    }

    void write_quant_table(RangeEncoder &c, const int32_t *t) {
        uint8_t st[kCS];
        std::memset(st, 128, kCS);
        int last = 0;
        for (int i = 1; i < 128; i++) {
            if (t[i] != t[i - 1]) {
                c.put_symbol(st, i - last - 1, false);
                last = i;
            }
        }
        c.put_symbol(st, 127 - last, false);
    }

    void write_header(RangeEncoder &c) {
        uint8_t st[kCS];
        std::memset(st, 128, kCS);
        c.put_symbol(st, 1, false);       // version
        c.put_symbol(st, 1, false);       // ac: range coder, default table
        c.put_symbol(st, 0, false);       // colorspace: YCbCr
        c.put_symbol(st, bits, false);
        c.put_rac(st, chroma ? 1 : 0);
        c.put_symbol(st, log2h, false);
        c.put_symbol(st, log2v, false);
        c.put_rac(st, 0);                 // transparency
        for (int i = 0; i < 5; i++) write_quant_table(c, quant[i]);
    }
};

}  // namespace

extern "C" {

void *fe_new(int bits, int chroma, int log2h, int log2v,
             const int32_t *quant /* 5*256 */, int context_count) {
    Ffv1Enc *e = new Ffv1Enc();
    e->bits = bits;
    e->chroma = chroma;
    e->log2h = log2h;
    e->log2v = log2v;
    std::memcpy(e->quant, quant, sizeof(e->quant));
    e->context_count = context_count;
    e->reset_states();
    return e;
}

void fe_free(void *h) { delete (Ffv1Enc *)h; }

// Encode one frame from precomputed (context, folded-residual) fields.
// ctx (uint16: contexts fit 10 bits, halving the device->host bytes)
// and diff (int8) are the planes' fields concatenated; plane_px[i]
// gives each plane's pixel count.  Returns the bitstream length, or
// -needed if `cap` was too small (call again with a bigger buffer),
// or -1 on invalid input.
long fe_encode(void *h, int key, int nplanes,
               const uint16_t *ctx, const int8_t *diff,
               const long *plane_px,
               uint8_t *out, long cap) {
    Ffv1Enc *e = (Ffv1Enc *)h;
    RangeEncoder c;
    long total = 0;
    for (int i = 0; i < nplanes; i++) total += plane_px[i];
    c.reserve((size_t)total / 2 + 4096);
    uint8_t keystate[kCS];
    std::memset(keystate, 128, kCS);
    c.put_rac(keystate, key ? 1 : 0);
    if (key) {
        e->write_header(c);
        e->reset_states();
    } else if (e->states[0].empty()) {
        return -1;  // first frame must be a keyframe
    }
    // snapshot the adaptive states: a failed attempt (undersized cap,
    // bad input) must not advance adaptation, or the caller's retry
    // would encode with double-stepped states and desync the decoder
    const std::vector<uint8_t> snap0 = e->states[0];
    const std::vector<uint8_t> snap1 = e->states[1];
    const unsigned ccount = (unsigned)e->context_count;
    long off = 0;
    Bits b = c.bits();
    for (int i = 0; i < nplanes; i++) {
        uint8_t *bank = e->states[i == 0 ? 0 : 1].data();
        const uint16_t *cp = ctx + off;
        const int8_t *dp = diff + off;
        const long n = plane_px[i];
        for (long k = 0; k < n; k++) {
            if (bits_need_grow(b, c.end)) {
                c.sync(b);
                c.grow_big(b.oc);
                b = c.bits();
            }
            unsigned cx = cp[k];
            if (__builtin_expect(cx >= ccount, 0)) {
                e->states[0] = snap0;
                e->states[1] = snap1;
                return -1;
            }
            bits_put_symbol8(b, bank + (size_t)cx * kCS, dp[k]);
        }
        off += n;
    }
    c.sync(b);
    c.terminate();
    long len = (long)c.size();
    if (len > cap) {
        e->states[0] = snap0;
        e->states[1] = snap1;
        return -len;
    }
    std::memcpy(out, c.buf, (size_t)len);
    return len;
}

// Packed-field variant: 2.25 bytes/px off the device instead of 3 —
// diff (int8, per-plane w*h rasters), lo = ctx&0xFF (uint8, same
// layout), hi4 = ctx>>8 packed 4-per-byte along rows with per-plane
// stride ceil(w/4).  Bitstream is byte-identical to fe_encode on the
// equivalent unpacked fields.
long fe_encode_packed(void *h, int key, int nplanes,
                      const int8_t *diff, const uint8_t *lo,
                      const uint8_t *hi4,
                      const long *plane_w, const long *plane_h,
                      uint8_t *out, long cap) {
    Ffv1Enc *e = (Ffv1Enc *)h;
    RangeEncoder c;
    long total = 0;
    for (int i = 0; i < nplanes; i++) total += plane_w[i] * plane_h[i];
    c.reserve((size_t)total / 2 + 4096);
    uint8_t keystate[kCS];
    std::memset(keystate, 128, kCS);
    c.put_rac(keystate, key ? 1 : 0);
    if (key) {
        e->write_header(c);
        e->reset_states();
    } else if (e->states[0].empty()) {
        return -1;  // first frame must be a keyframe
    }
    const std::vector<uint8_t> snap0 = e->states[0];
    const std::vector<uint8_t> snap1 = e->states[1];
    const unsigned ccount = (unsigned)e->context_count;
    const int8_t *dp = diff;
    const uint8_t *lp = lo;
    const uint8_t *hp = hi4;
    Bits b = c.bits();
    for (int i = 0; i < nplanes; i++) {
        uint8_t *bank = e->states[i == 0 ? 0 : 1].data();
        const long w = plane_w[i], hgt = plane_h[i];
        const long hs = (w + 3) / 4;
        for (long y = 0; y < hgt; y++) {
            const uint8_t *hrow = hp + y * hs;
            for (long x = 0; x < w; x++) {
                if (bits_need_grow(b, c.end)) {
                    c.sync(b);
                    c.grow_big(b.oc);
                    b = c.bits();
                }
                unsigned cx = (unsigned)lp[x]
                    | ((unsigned)((hrow[x >> 2] >> ((x & 3) * 2)) & 3)
                       << 8);
                if (__builtin_expect(cx >= ccount, 0)) {
                    e->states[0] = snap0;
                    e->states[1] = snap1;
                    return -1;
                }
                bits_put_symbol8(b, bank + (size_t)cx * kCS, dp[x]);
            }
            dp += w;
            lp += w;
        }
        hp += hs * hgt;
    }
    c.sync(b);
    c.terminate();
    long len = (long)c.size();
    if (len > cap) {
        e->states[0] = snap0;
        e->states[1] = snap1;
        return -len;
    }
    std::memcpy(out, c.buf, (size_t)len);
    return len;
}

// Plane-context variant: the device ships ONLY the folded residual
// field (1 byte/px — the minimal hop); the 3-gradient quantized
// context is re-derived inline from the SOURCE plane, which the host
// already owns (FFV1 is lossless, so decoder reconstruction == source
// and context derivation is a pure function of the neighbors).  The
// per-pixel cost is three L1-resident table lookups riding the same
// raster scan the coder performs anyway.  Border rules mirror
// gstpu/ops/ffv1_pred.predict_fields exactly (pinned against
// libavcodec): row 0 has t=tl=tr=0, l(0)=t(0), tl(0) = sample two
// rows up, tr(w-1)=t(w-1).  Bitstream is byte-identical to
// fe_encode_packed on the device-computed context fields.
long fe_encode_from_plane(void *h, int key, int nplanes,
                          const uint8_t *planes, const int8_t *diff,
                          const long *plane_w, const long *plane_h,
                          uint8_t *out, long cap) {
    Ffv1Enc *e = (Ffv1Enc *)h;
    RangeEncoder c;
    long total = 0;
    for (int i = 0; i < nplanes; i++) total += plane_w[i] * plane_h[i];
    c.reserve((size_t)total / 2 + 4096);
    uint8_t keystate[kCS];
    std::memset(keystate, 128, kCS);
    c.put_rac(keystate, key ? 1 : 0);
    if (key) {
        e->write_header(c);
        e->reset_states();
    } else if (e->states[0].empty()) {
        return -1;  // first frame must be a keyframe
    }
    const std::vector<uint8_t> snap0 = e->states[0];
    const std::vector<uint8_t> snap1 = e->states[1];
    const int32_t *q0 = e->quant[0];
    const int32_t *q1 = e->quant[1];
    const int32_t *q2 = e->quant[2];
    const int8_t *dp = diff;
    const uint8_t *pp = planes;
    std::vector<uint8_t> zrow;
    Bits b = c.bits();
    for (int i = 0; i < nplanes; i++) {
        uint8_t *bank = e->states[i == 0 ? 0 : 1].data();
        const long w = plane_w[i], hgt = plane_h[i];
        if ((long)zrow.size() < w) zrow.assign((size_t)w, 0);
        for (long y = 0; y < hgt; y++) {
            const uint8_t *row = pp + y * w;
            const uint8_t *up = y > 0 ? pp + (y - 1) * w : zrow.data();
            // x = 0: l = t, tl = two rows up
            {
                if (bits_need_grow(b, c.end)) {
                    c.sync(b);
                    c.grow_big(b.oc);
                    b = c.bits();
                }
                const int T = up[0];
                const int RT = w > 1 ? up[1] : up[0];
                const int L = T;
                const int LT = y > 1 ? pp[(y - 2) * w] : 0;
                int s = q0[(L - LT) & 0xFF] + q1[(LT - T) & 0xFF]
                        + q2[(T - RT) & 0xFF];
                unsigned cx = (unsigned)(s < 0 ? -s : s);
                bits_put_symbol8(b, bank + (size_t)cx * kCS, dp[0]);
            }
            for (long x = 1; x < w - 1; x++) {
                if (bits_need_grow(b, c.end)) {
                    c.sync(b);
                    c.grow_big(b.oc);
                    b = c.bits();
                }
                const int T = up[x];
                const int RT = up[x + 1];
                const int L = row[x - 1];
                const int LT = up[x - 1];
                int s = q0[(L - LT) & 0xFF] + q1[(LT - T) & 0xFF]
                        + q2[(T - RT) & 0xFF];
                unsigned cx = (unsigned)(s < 0 ? -s : s);
                bits_put_symbol8(b, bank + (size_t)cx * kCS, dp[x]);
            }
            if (w > 1) {  // x = w-1: tr = t
                if (bits_need_grow(b, c.end)) {
                    c.sync(b);
                    c.grow_big(b.oc);
                    b = c.bits();
                }
                const long x = w - 1;
                const int T = up[x];
                const int RT = T;
                const int L = row[x - 1];
                const int LT = up[x - 1];
                int s = q0[(L - LT) & 0xFF] + q1[(LT - T) & 0xFF]
                        + q2[(T - RT) & 0xFF];
                unsigned cx = (unsigned)(s < 0 ? -s : s);
                bits_put_symbol8(b, bank + (size_t)cx * kCS, dp[x]);
            }
            dp += w;
        }
        pp += w * hgt;
    }
    c.sync(b);
    c.terminate();
    long len = (long)c.size();
    if (len > cap) {
        e->states[0] = snap0;
        e->states[1] = snap1;
        return -len;
    }
    std::memcpy(out, c.buf, (size_t)len);
    return len;
}

// Diff-only variant for DEVICE-RESIDENT sources: the host never sees
// the source plane at all — the device ships ONLY the folded residual
// field (1 byte/px, the minimal possible hop) and the coder
// RECONSTRUCTS the plane inline as it scans, exactly as a decoder
// would (FFV1 is lossless: residual + median prediction over
// already-reconstructed neighbors recovers every sample bit-exactly,
// RFC 9043 §3.8).  This removes the host->device source upload from
// the loop entirely, which matters when frames originate on the
// device (upstream device-resident chains) or ride a slow
// host<->device link.  Per-pixel extra cost vs fe_encode_from_plane:
// one median (3 cmp) + add + mask + store.  Bitstream is
// byte-identical to the other entry points.
long fe_encode_from_diff(void *h, int key, int nplanes,
                         const int8_t *diff,
                         const long *plane_w, const long *plane_h,
                         uint8_t *out, long cap) {
    Ffv1Enc *e = (Ffv1Enc *)h;
    RangeEncoder c;
    long total = 0, maxpx = 0;
    for (int i = 0; i < nplanes; i++) {
        total += plane_w[i] * plane_h[i];
        if (plane_w[i] * plane_h[i] > maxpx)
            maxpx = plane_w[i] * plane_h[i];
    }
    c.reserve((size_t)total / 2 + 4096);
    uint8_t keystate[kCS];
    std::memset(keystate, 128, kCS);
    c.put_rac(keystate, key ? 1 : 0);
    if (key) {
        e->write_header(c);
        e->reset_states();
    } else if (e->states[0].empty()) {
        return -1;  // first frame must be a keyframe
    }
    const std::vector<uint8_t> snap0 = e->states[0];
    const std::vector<uint8_t> snap1 = e->states[1];
    const int32_t *q0 = e->quant[0];
    const int32_t *q1 = e->quant[1];
    const int32_t *q2 = e->quant[2];
    const int8_t *dp = diff;
    std::vector<uint8_t> recon((size_t)maxpx);
    std::vector<uint8_t> zrow;
    Bits b = c.bits();
    for (int i = 0; i < nplanes; i++) {
        uint8_t *bank = e->states[i == 0 ? 0 : 1].data();
        const long w = plane_w[i], hgt = plane_h[i];
        uint8_t *pp = recon.data();
        if ((long)zrow.size() < w) zrow.assign((size_t)w, 0);
        for (long y = 0; y < hgt; y++) {
            uint8_t *row = pp + y * w;
            const uint8_t *up = y > 0 ? pp + (y - 1) * w : zrow.data();
            {   // x = 0: l = t, tl = two rows up
                if (bits_need_grow(b, c.end)) {
                    c.sync(b);
                    c.grow_big(b.oc);
                    b = c.bits();
                }
                const int T = up[0];
                const int RT = w > 1 ? up[1] : T;
                const int L = T;
                const int LT = y > 1 ? pp[(y - 2) * w] : 0;
                const int s = q0[(L - LT) & 0xFF] + q1[(LT - T) & 0xFF]
                              + q2[(T - RT) & 0xFF];
                const unsigned cx = (unsigned)(s < 0 ? -s : s);
                const int d = dp[0];
                bits_put_symbol8(b, bank + (size_t)cx * kCS, d);
                const int grad = L + T - LT;
                const int mn = L < T ? L : T, mx = L < T ? T : L;
                const int pred = grad < mn ? mn : (grad > mx ? mx : grad);
                row[0] = (uint8_t)((pred + (s < 0 ? -d : d)) & 0xFF);
            }
            for (long x = 1; x < w - 1; x++) {
                if (bits_need_grow(b, c.end)) {
                    c.sync(b);
                    c.grow_big(b.oc);
                    b = c.bits();
                }
                const int T = up[x];
                const int RT = up[x + 1];
                const int L = row[x - 1];
                const int LT = up[x - 1];
                const int s = q0[(L - LT) & 0xFF] + q1[(LT - T) & 0xFF]
                              + q2[(T - RT) & 0xFF];
                const unsigned cx = (unsigned)(s < 0 ? -s : s);
                const int d = dp[x];
                bits_put_symbol8(b, bank + (size_t)cx * kCS, d);
                // reconstruct: median(l, t, l+t-tl) + (sign ? -d : d)
                const int grad = L + T - LT;
                const int mn = L < T ? L : T, mx = L < T ? T : L;
                const int pred = grad < mn ? mn : (grad > mx ? mx : grad);
                row[x] = (uint8_t)((pred + (s < 0 ? -d : d)) & 0xFF);
            }
            if (w > 1) {  // x = w-1: tr = t
                if (bits_need_grow(b, c.end)) {
                    c.sync(b);
                    c.grow_big(b.oc);
                    b = c.bits();
                }
                const long x = w - 1;
                const int T = up[x];
                const int RT = T;
                const int L = row[x - 1];
                const int LT = up[x - 1];
                const int s = q0[(L - LT) & 0xFF] + q1[(LT - T) & 0xFF]
                              + q2[(T - RT) & 0xFF];
                const unsigned cx = (unsigned)(s < 0 ? -s : s);
                const int d = dp[x];
                bits_put_symbol8(b, bank + (size_t)cx * kCS, d);
                const int grad = L + T - LT;
                const int mn = L < T ? L : T, mx = L < T ? T : L;
                const int pred = grad < mn ? mn : (grad > mx ? mx : grad);
                row[x] = (uint8_t)((pred + (s < 0 ? -d : d)) & 0xFF);
            }
            dp += w;
        }
    }
    c.sync(b);
    c.terminate();
    long len = (long)c.size();
    if (len > cap) {
        e->states[0] = snap0;
        e->states[1] = snap1;
        return -len;
    }
    std::memcpy(out, c.buf, (size_t)len);
    return len;
}

}  // extern "C"

