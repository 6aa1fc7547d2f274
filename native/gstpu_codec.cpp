// gstpu native codec runtime: thin C-ABI shim over libavcodec.
//
// The reference's heavy codec elements wrap native engines — dav1ddec
// wraps libdav1d (video/dav1d/Cargo.toml), rav1enc wraps the rav1e
// encoder (video/rav1e/src/rav1enc/imp.rs), ffv1dec the ffv1 decoder.
// gstpu does the same through this shim: a stable mini-ABI (opaque
// handles, send/pull loops, packed I420 frames) consumed via ctypes
// (gstpu/native_codec.py).  Keeping the libavcodec structs on this
// side of the boundary isolates Python from ABI drift.
//
// Build: make -C native libgstpu_codec.so   (links -lavcodec -lavutil)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <deque>
#include <string>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
}

namespace {

struct Encoder {
    AVCodecContext* ctx = nullptr;
    AVFrame* frame = nullptr;
    std::deque<AVPacket*> packets;
    std::string err;
    bool flushed = false;
    int64_t nsent = 0;
};

struct Decoder {
    AVCodecContext* ctx = nullptr;
    std::deque<AVFrame*> frames;
    std::string err;
};

void drain_encoder(Encoder* e) {
    for (;;) {
        AVPacket* pkt = av_packet_alloc();
        int r = avcodec_receive_packet(e->ctx, pkt);
        if (r == 0) {
            e->packets.push_back(pkt);
        } else {
            av_packet_free(&pkt);
            break;
        }
    }
}

void drain_decoder(Decoder* d) {
    for (;;) {
        AVFrame* f = av_frame_alloc();
        int r = avcodec_receive_frame(d->ctx, f);
        if (r == 0) {
            d->frames.push_back(f);
        } else {
            av_frame_free(&f);
            break;
        }
    }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// encoder
// ---------------------------------------------------------------------------

// pix_fmt: 0 = yuv420p (I420).  opts: "key=value\nkey=value" applied
// with av_opt_set on the codec's private context.
void* gc_encoder_open(const char* codec_name, int w, int h,
                      int pix_fmt, int fps_num, int fps_den,
                      const char* opts) {
    const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return nullptr;
    auto* e = new Encoder();
    e->ctx = avcodec_alloc_context3(codec);
    e->ctx->width = w;
    e->ctx->height = h;
    e->ctx->pix_fmt = pix_fmt == 0 ? AV_PIX_FMT_YUV420P
                                   : AV_PIX_FMT_YUV420P10LE;
    e->ctx->time_base = AVRational{fps_den > 0 ? fps_den : 1,
                                   fps_num > 0 ? fps_num : 30};
    e->ctx->framerate = AVRational{fps_num > 0 ? fps_num : 30,
                                   fps_den > 0 ? fps_den : 1};
    if (opts && *opts) {
        std::string s(opts);
        size_t pos = 0;
        while (pos < s.size()) {
            size_t nl = s.find('\n', pos);
            if (nl == std::string::npos) nl = s.size();
            std::string kv = s.substr(pos, nl - pos);
            size_t eq = kv.find('=');
            if (eq != std::string::npos)
                av_opt_set(e->ctx->priv_data ? (void*)e->ctx : (void*)e->ctx,
                           kv.substr(0, eq).c_str(),
                           kv.substr(eq + 1).c_str(),
                           AV_OPT_SEARCH_CHILDREN);
            pos = nl + 1;
        }
    }
    if (avcodec_open2(e->ctx, codec, nullptr) < 0) {
        avcodec_free_context(&e->ctx);
        delete e;
        return nullptr;
    }
    e->frame = av_frame_alloc();
    e->frame->format = e->ctx->pix_fmt;
    e->frame->width = w;
    e->frame->height = h;
    av_frame_get_buffer(e->frame, 0);
    return e;
}

// frame: tightly packed I420 (Y then U then V planes)
int gc_encoder_send(void* h, const uint8_t* data, int64_t pts) {
    auto* e = static_cast<Encoder*>(h);
    av_frame_make_writable(e->frame);
    int w = e->ctx->width, ht = e->ctx->height;
    int cw = (w + 1) / 2, ch = (ht + 1) / 2;
    const uint8_t* src = data;
    for (int row = 0; row < ht; row++)
        memcpy(e->frame->data[0] + row * e->frame->linesize[0],
               src + row * w, w);
    src += w * ht;
    for (int p = 1; p <= 2; p++) {
        for (int row = 0; row < ch; row++)
            memcpy(e->frame->data[p] + row * e->frame->linesize[p],
                   src + row * cw, cw);
        src += cw * ch;
    }
    e->frame->pts = pts;
    e->nsent++;
    int r = avcodec_send_frame(e->ctx, e->frame);
    drain_encoder(e);
    return r;
}

int gc_encoder_finish(void* h) {
    auto* e = static_cast<Encoder*>(h);
    // SVT-AV1 1.4.1 deadlocks when EOS arrives with zero frames sent
    // (the same engine bug gc_encoder_close works around below).
    // Zero frames in = zero packets out, so skip the flush here and
    // leave EOS to close()'s gray-frame path.
    if (e->nsent == 0) return 0;
    int r = avcodec_send_frame(e->ctx, nullptr);
    e->flushed = true;
    drain_encoder(e);
    return r;
}

// returns packet size (copies into buf if cap is big enough), 0 if no
// packet pending; a 0-cap call peeks the size without popping.
long gc_encoder_packet(void* h, uint8_t* buf, long cap, int64_t* pts,
                       int* keyframe) {
    auto* e = static_cast<Encoder*>(h);
    if (e->packets.empty()) return 0;
    AVPacket* pkt = e->packets.front();
    long size = pkt->size;
    if (buf == nullptr || cap < size) return size;
    memcpy(buf, pkt->data, size);
    if (pts) *pts = pkt->pts;
    if (keyframe) *keyframe = (pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
    e->packets.pop_front();
    av_packet_free(&pkt);
    return size;
}

void gc_encoder_close(void* h) {
    auto* e = static_cast<Encoder*>(h);
    if (!e->flushed) {
        // some engines (SVT-AV1 1.4.1) deadlock in deinit when the
        // context is freed before EOS — and ALSO when EOS arrives
        // with zero frames sent; feed one gray frame in that case
        if (e->nsent == 0 && e->frame && e->frame->data[0]) {
            av_frame_make_writable(e->frame);
            int w = e->ctx->width, ht = e->ctx->height;
            for (int row = 0; row < ht; row++)
                memset(e->frame->data[0] + row * e->frame->linesize[0],
                       128, w);
            int cw = (w + 1) / 2, ch = (ht + 1) / 2;
            for (int p = 1; p <= 2; p++)
                for (int row = 0; row < ch; row++)
                    memset(e->frame->data[p]
                           + row * e->frame->linesize[p], 128, cw);
            e->frame->pts = 0;
            avcodec_send_frame(e->ctx, e->frame);
        }
        avcodec_send_frame(e->ctx, nullptr);
        drain_encoder(e);
    }
    for (auto* p : e->packets) av_packet_free(&p);
    av_frame_free(&e->frame);
    avcodec_free_context(&e->ctx);
    delete e;
}

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

void* gc_decoder_open2(const char* codec_name, const uint8_t* extradata,
                       long extradata_size, int w, int h,
                       const char* options) {
    const AVCodec* codec = avcodec_find_decoder_by_name(codec_name);
    if (!codec) return nullptr;
    auto* d = new Decoder();
    d->ctx = avcodec_alloc_context3(codec);
    if (w > 0) d->ctx->width = w;
    if (h > 0) d->ctx->height = h;
    if (extradata && extradata_size > 0) {
        d->ctx->extradata = (uint8_t*)av_mallocz(
            extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(d->ctx->extradata, extradata, extradata_size);
        d->ctx->extradata_size = (int)extradata_size;
    }
    // "k=v,k=v" decoder options (e.g. libdav1d filmgrain /
    // max_frame_delay / threads); unknown keys are left in the dict
    // and ignored, so option names can track libavcodec versions
    AVDictionary* dict = nullptr;
    if (options && *options)
        av_dict_parse_string(&dict, options, "=", ",", 0);
    int rc = avcodec_open2(d->ctx, codec, &dict);
    av_dict_free(&dict);
    if (rc < 0) {
        avcodec_free_context(&d->ctx);
        delete d;
        return nullptr;
    }
    return d;
}

void* gc_decoder_open(const char* codec_name, const uint8_t* extradata,
                      long extradata_size, int w, int h) {
    return gc_decoder_open2(codec_name, extradata, extradata_size,
                            w, h, nullptr);
}

int gc_decoder_send(void* h, const uint8_t* data, long size,
                    int64_t pts) {
    auto* d = static_cast<Decoder*>(h);
    AVPacket* pkt = av_packet_alloc();
    av_new_packet(pkt, (int)size);
    memcpy(pkt->data, data, size);
    pkt->pts = pts;
    int r = avcodec_send_packet(d->ctx, pkt);
    av_packet_free(&pkt);
    drain_decoder(d);
    return r;
}

int gc_decoder_finish(void* h) {
    auto* d = static_cast<Decoder*>(h);
    int r = avcodec_send_packet(d->ctx, nullptr);
    drain_decoder(d);
    return r;
}

// peek/pop a frame as tightly packed planes.  fmt out: 0 = yuv420p,
// 1 = yuv420p10le, -1 = other (unsupported).  Returns byte size
// needed/copied; 0 if none pending.
long gc_decoder_frame(void* h, uint8_t* buf, long cap, int* w, int* ht,
                      int* fmt, int64_t* pts) {
    auto* d = static_cast<Decoder*>(h);
    if (d->frames.empty()) return 0;
    AVFrame* f = d->frames.front();
    int fw = f->width, fh = f->height;
    int bpp = 1;
    int ofmt;
    if (f->format == AV_PIX_FMT_YUV420P) ofmt = 0;
    else if (f->format == AV_PIX_FMT_YUV420P10LE) { ofmt = 1; bpp = 2; }
    else ofmt = -1;
    int cw = (fw + 1) / 2, ch = (fh + 1) / 2;
    long size = (long)fw * fh * bpp + 2L * cw * ch * bpp;
    if (w) *w = fw;
    if (ht) *ht = fh;
    if (fmt) *fmt = ofmt;
    if (buf == nullptr || cap < size || ofmt < 0) {
        if (ofmt < 0 && buf != nullptr) {  // drop unsupported frame
            d->frames.pop_front();
            av_frame_free(&f);
        }
        return size;
    }
    uint8_t* dst = buf;
    for (int row = 0; row < fh; row++)
        memcpy(dst + (long)row * fw * bpp,
               f->data[0] + (long)row * f->linesize[0], fw * bpp);
    dst += (long)fw * fh * bpp;
    for (int p = 1; p <= 2; p++) {
        for (int row = 0; row < ch; row++)
            memcpy(dst + (long)row * cw * bpp,
                   f->data[p] + (long)row * f->linesize[p], cw * bpp);
        dst += (long)cw * ch * bpp;
    }
    if (pts) *pts = f->pts;
    d->frames.pop_front();
    av_frame_free(&f);
    return size;
}

void gc_decoder_close(void* h) {
    auto* d = static_cast<Decoder*>(h);
    for (auto* f : d->frames) av_frame_free(&f);
    avcodec_free_context(&d->ctx);
    delete d;
}

// ---------------------------------------------------------------------------
// audio encoder / decoder
//
// The reference's webrtcsink leans on the ecosystem opus/vpx elements
// (net/webrtc/src/webrtcsink/imp.rs:106-346 codec registry); gstpu's
// opusenc/opusdec wrap the in-image libopus the same way the video
// tier wraps libdav1d/libaom.  Samples cross the boundary as
// interleaved f32; the shim converts to/from the engine's native
// sample format.
// ---------------------------------------------------------------------------

namespace {

struct AEncoder {
    AVCodecContext* ctx = nullptr;
    AVFrame* frame = nullptr;
    std::deque<AVPacket*> packets;
    bool flushed = false;
};

struct ADecoder {
    AVCodecContext* ctx = nullptr;
    std::deque<AVFrame*> frames;
};

void drain_aencoder(AEncoder* e) {
    for (;;) {
        AVPacket* pkt = av_packet_alloc();
        if (avcodec_receive_packet(e->ctx, pkt) == 0) {
            e->packets.push_back(pkt);
        } else {
            av_packet_free(&pkt);
            break;
        }
    }
}

void drain_adecoder(ADecoder* d) {
    for (;;) {
        AVFrame* f = av_frame_alloc();
        if (avcodec_receive_frame(d->ctx, f) == 0) {
            d->frames.push_back(f);
        } else {
            av_frame_free(&f);
            break;
        }
    }
}

// pick the engine sample format closest to interleaved f32
AVSampleFormat pick_sample_fmt(const AVCodec* codec) {
    if (!codec->sample_fmts) return AV_SAMPLE_FMT_FLT;
    const AVSampleFormat prefs[] = {
        AV_SAMPLE_FMT_FLT, AV_SAMPLE_FMT_FLTP,
        AV_SAMPLE_FMT_S16, AV_SAMPLE_FMT_S16P};
    for (AVSampleFormat want : prefs)
        for (const AVSampleFormat* p = codec->sample_fmts;
             *p != AV_SAMPLE_FMT_NONE; p++)
            if (*p == want) return want;
    return codec->sample_fmts[0];
}

inline int16_t f32_to_s16(float v) {
    float s = v * 32768.0f;
    if (s > 32767.0f) s = 32767.0f;
    if (s < -32768.0f) s = -32768.0f;
    return (int16_t)lrintf(s);
}

}  // namespace

// Returns handle; *frame_size_out = samples the engine wants per send
// (0 = any).  opts as in gc_encoder_open.
void* ga_encoder_open(const char* codec_name, int sample_rate,
                      int channels, int64_t bit_rate, const char* opts,
                      int* frame_size_out) {
    const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return nullptr;
    auto* e = new AEncoder();
    e->ctx = avcodec_alloc_context3(codec);
    e->ctx->sample_rate = sample_rate;
    av_channel_layout_default(&e->ctx->ch_layout, channels);
    e->ctx->sample_fmt = pick_sample_fmt(codec);
    e->ctx->time_base = AVRational{1, sample_rate};
    if (bit_rate > 0) e->ctx->bit_rate = bit_rate;
    if (opts && *opts) {
        std::string s(opts);
        size_t pos = 0;
        while (pos < s.size()) {
            size_t nl = s.find('\n', pos);
            if (nl == std::string::npos) nl = s.size();
            std::string kv = s.substr(pos, nl - pos);
            size_t eq = kv.find('=');
            if (eq != std::string::npos)
                av_opt_set(e->ctx, kv.substr(0, eq).c_str(),
                           kv.substr(eq + 1).c_str(),
                           AV_OPT_SEARCH_CHILDREN);
            pos = nl + 1;
        }
    }
    if (avcodec_open2(e->ctx, codec, nullptr) < 0) {
        avcodec_free_context(&e->ctx);
        delete e;
        return nullptr;
    }
    if (frame_size_out) *frame_size_out = e->ctx->frame_size;
    e->frame = av_frame_alloc();
    return e;
}

long ga_encoder_extradata(void* h, uint8_t* buf, long cap) {
    auto* e = static_cast<AEncoder*>(h);
    long n = e->ctx->extradata_size;
    if (buf && cap >= n && n > 0) memcpy(buf, e->ctx->extradata, n);
    return n;
}

// samples: interleaved f32, nsamples per channel
int ga_encoder_send(void* h, const float* samples, int nsamples,
                    int64_t pts) {
    auto* e = static_cast<AEncoder*>(h);
    AVFrame* f = e->frame;
    av_frame_unref(f);
    f->format = e->ctx->sample_fmt;
    av_channel_layout_copy(&f->ch_layout, &e->ctx->ch_layout);
    f->sample_rate = e->ctx->sample_rate;
    f->nb_samples = nsamples;
    if (av_frame_get_buffer(f, 0) < 0) return -1;
    int ch = e->ctx->ch_layout.nb_channels;
    switch (e->ctx->sample_fmt) {
    case AV_SAMPLE_FMT_FLT:
        memcpy(f->data[0], samples, sizeof(float) * nsamples * ch);
        break;
    case AV_SAMPLE_FMT_FLTP:
        for (int c = 0; c < ch; c++) {
            float* dst = (float*)f->data[c];
            for (int i = 0; i < nsamples; i++)
                dst[i] = samples[i * ch + c];
        }
        break;
    case AV_SAMPLE_FMT_S16: {
        int16_t* dst = (int16_t*)f->data[0];
        for (int i = 0; i < nsamples * ch; i++)
            dst[i] = f32_to_s16(samples[i]);
        break;
    }
    case AV_SAMPLE_FMT_S16P:
        for (int c = 0; c < ch; c++) {
            int16_t* dst = (int16_t*)f->data[c];
            for (int i = 0; i < nsamples; i++)
                dst[i] = f32_to_s16(samples[i * ch + c]);
        }
        break;
    default:
        return -2;
    }
    f->pts = pts;
    int r = avcodec_send_frame(e->ctx, f);
    drain_aencoder(e);
    return r;
}

int ga_encoder_finish(void* h) {
    auto* e = static_cast<AEncoder*>(h);
    int r = avcodec_send_frame(e->ctx, nullptr);
    e->flushed = true;
    drain_aencoder(e);
    return r;
}

long ga_encoder_packet(void* h, uint8_t* buf, long cap, int64_t* pts,
                       int* duration) {
    auto* e = static_cast<AEncoder*>(h);
    if (e->packets.empty()) return 0;
    AVPacket* pkt = e->packets.front();
    long size = pkt->size;
    if (buf == nullptr || cap < size) return size;
    memcpy(buf, pkt->data, size);
    if (pts) *pts = pkt->pts;
    if (duration) *duration = (int)pkt->duration;
    e->packets.pop_front();
    av_packet_free(&pkt);
    return size;
}

void ga_encoder_close(void* h) {
    auto* e = static_cast<AEncoder*>(h);
    if (!e->flushed) {          // see gc_encoder_close
        avcodec_send_frame(e->ctx, nullptr);
        drain_aencoder(e);
    }
    for (auto* p : e->packets) av_packet_free(&p);
    av_frame_free(&e->frame);
    avcodec_free_context(&e->ctx);
    delete e;
}

void* ga_decoder_open(const char* codec_name, int sample_rate,
                      int channels, const uint8_t* extradata,
                      long extradata_size) {
    const AVCodec* codec = avcodec_find_decoder_by_name(codec_name);
    if (!codec) return nullptr;
    auto* d = new ADecoder();
    d->ctx = avcodec_alloc_context3(codec);
    if (sample_rate > 0) d->ctx->sample_rate = sample_rate;
    if (channels > 0)
        av_channel_layout_default(&d->ctx->ch_layout, channels);
    if (extradata && extradata_size > 0) {
        d->ctx->extradata = (uint8_t*)av_mallocz(
            extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(d->ctx->extradata, extradata, extradata_size);
        d->ctx->extradata_size = (int)extradata_size;
    }
    if (avcodec_open2(d->ctx, codec, nullptr) < 0) {
        avcodec_free_context(&d->ctx);
        delete d;
        return nullptr;
    }
    return d;
}

int ga_decoder_send(void* h, const uint8_t* data, long size,
                    int64_t pts) {
    auto* d = static_cast<ADecoder*>(h);
    AVPacket* pkt = av_packet_alloc();
    av_new_packet(pkt, (int)size);
    memcpy(pkt->data, data, size);
    pkt->pts = pts;
    int r = avcodec_send_packet(d->ctx, pkt);
    av_packet_free(&pkt);
    drain_adecoder(d);
    return r;
}

int ga_decoder_finish(void* h) {
    auto* d = static_cast<ADecoder*>(h);
    int r = avcodec_send_packet(d->ctx, nullptr);
    drain_adecoder(d);
    return r;
}

// peek/pop one frame as interleaved f32.  Returns float count
// (nsamples * channels) needed/copied; 0 if none pending.
long ga_decoder_frame(void* h, float* buf, long cap_floats,
                      int* nsamples, int* channels, int* rate,
                      int64_t* pts) {
    auto* d = static_cast<ADecoder*>(h);
    if (d->frames.empty()) return 0;
    AVFrame* f = d->frames.front();
    int ch = f->ch_layout.nb_channels;
    int ns = f->nb_samples;
    long total = (long)ns * ch;
    if (nsamples) *nsamples = ns;
    if (channels) *channels = ch;
    if (rate) *rate = f->sample_rate;
    if (buf == nullptr || cap_floats < total) return total;
    switch (f->format) {
    case AV_SAMPLE_FMT_FLT:
        memcpy(buf, f->data[0], sizeof(float) * total);
        break;
    case AV_SAMPLE_FMT_FLTP:
        for (int c = 0; c < ch; c++) {
            const float* src = (const float*)f->data[c];
            for (int i = 0; i < ns; i++) buf[i * ch + c] = src[i];
        }
        break;
    case AV_SAMPLE_FMT_S16: {
        const int16_t* src = (const int16_t*)f->data[0];
        for (long i = 0; i < total; i++) buf[i] = src[i] / 32768.0f;
        break;
    }
    case AV_SAMPLE_FMT_S16P:
        for (int c = 0; c < ch; c++) {
            const int16_t* src = (const int16_t*)f->data[c];
            for (int i = 0; i < ns; i++)
                buf[i * ch + c] = src[i] / 32768.0f;
        }
        break;
    case AV_SAMPLE_FMT_S32: {
        const int32_t* src = (const int32_t*)f->data[0];
        for (long i = 0; i < total; i++)
            buf[i] = (float)(src[i] / 2147483648.0);
        break;
    }
    default:
        d->frames.pop_front();
        av_frame_free(&f);
        return -1;
    }
    if (pts) *pts = f->pts;
    d->frames.pop_front();
    av_frame_free(&f);
    return total;
}

void ga_decoder_close(void* h) {
    auto* d = static_cast<ADecoder*>(h);
    for (auto* f : d->frames) av_frame_free(&f);
    avcodec_free_context(&d->ctx);
    delete d;
}

}  // extern "C"
