"""ffv1enc throughput: gstpu's TPU-split FFV1 encoder vs libavcodec's.

The split (SURVEY.md §2.8 P4): prediction/residual fields for each
frame compute on the TPU as one fused pass, overlapped with the host
C++ range coder working on the previous frame — so the single host
core spends its cycles ONLY on the inherently sequential entropy
coding, while libavcodec's encoder must also run prediction on that
same core.  hop=diff (the element default) ships 1 byte/px off the
device — the folded residuals only; the 3-gradient contexts are
re-derived inline in the native scan from the host-resident source
plane (+1.3 ms/frame, hidden in the coder's dependency stalls) —
so even this dev tunnel's ~20 MB/s D2H moves a frame's fields in
less than the coder's service time and the download pipelines to
zero.  Both encoders see identical 1080p I420 content; ours is
conformance-gated (libavcodec decodes it bit-exactly,
tests/test_ffv1enc.py, byte-identity across hop modes included).

Prints ONE JSON line: value = gstpu fps, vs_baseline = gstpu fps /
libavcodec fps (same machine, same content, coder=ac).
"""

import json
import time

import numpy as np

W, H = 1920, 1080
FRAMES = 24


def make_frames():
    """Gradient + film-grain noise: a realistic archival-content mix of
    smooth regions and texture."""
    rng = np.random.default_rng(42)
    base_y = ((np.arange(H)[:, None] * 2 + np.arange(W)[None, :])
              % 256).astype(np.uint8)
    out = []
    for i in range(FRAMES):
        y = np.roll(base_y, i * 3, axis=1).astype(np.int32)
        y = (y + rng.integers(-12, 13, y.shape)).clip(0, 255).astype(np.uint8)
        u = (rng.integers(-8, 9, (H // 2, W // 2))
             + 120 + i).clip(0, 255).astype(np.uint8)
        v = (rng.integers(-8, 9, (H // 2, W // 2))
             + 130 - i).clip(0, 255).astype(np.uint8)
        out.append([y, u, v])
    return out


def bench_gstpu(frames):
    """Drive the ffv1enc ELEMENT: its transform() pipelines the device
    field pass + download one frame deep under the host range coder."""
    from gstpu.core.caps import Caps
    from gstpu.core.registry import make
    from gstpu.core.video import VideoInfo

    vi = VideoInfo("I420", W, H)
    enc = make("ffv1enc")
    enc.gop = 1
    incaps = Caps.from_string(
        f"video/x-raw, format=I420, width={W}, height={H}, "
        f"framerate=25/1")
    enc.set_caps(incaps, Caps.new("video/x-ffv1"))
    assert enc._coder is not None, "native coder required for the bench"

    def push(planes, i):
        i420 = np.concatenate([pl.ravel() for pl in planes])
        return enc.transform(vi.make_buffer(i420, pts=i))

    # warm-up: compile cache for both plane shapes AND the tunnel's
    # one-time D2H relayout path (first (1080,1920)-u16 download pays
    # a remote layout-program compile measured in minutes)
    out = push(frames[0], 0) + enc.drain()
    assert len(out) == 1
    enc._frame_n = 0

    nbytes = 0
    t0 = time.perf_counter()
    for i, f in enumerate(frames):
        for b in push(f, i + 1):
            nbytes += len(b.to_bytes())
    for b in enc.drain():
        nbytes += len(b.to_bytes())
    dt = time.perf_counter() - t0

    # architectural split: entropy-only rate on pre-materialized
    # fields = the host-core cost with the device field pass + its
    # transfer fully hidden (the ideal the pipelined element
    # approaches as the hop shrinks below the coder's service time)
    fields = []
    for f in frames[:8]:
        dev = [enc._pred.dispatch_diff(pl) for pl in f]
        fields.append((f, enc._materialize_diff(dev)))
    enc._coder.encode_from_plane(True, *fields[0])
    t1 = time.perf_counter()
    for i, (pl, dl) in enumerate(fields):
        enc._coder.encode_from_plane(i == 0, pl, dl)
    entropy_fps = len(fields) / (time.perf_counter() - t1)
    enc.stop()
    return len(frames) / dt, nbytes, entropy_fps


def bench_libav(frames):
    from gstpu.native_codec import NativeEncoder
    enc = NativeEncoder("ffv1", W, H, opts={"coder": "ac"})
    packed = [np.concatenate([pl.ravel() for pl in f]) for f in frames]
    # warm-up frame (context allocation etc.)
    enc.send(packed[0], 0)
    nbytes = 0
    t0 = time.perf_counter()
    for i, f in enumerate(packed):
        for d, *_ in enc.send(f, i + 1):
            nbytes += len(d)
    for d, *_ in enc.finish():
        nbytes += len(d)
    dt = time.perf_counter() - t0
    enc.close()
    return len(frames) / dt, nbytes


def main():
    frames = make_frames()
    av_fps, av_bytes = bench_libav(frames)
    fps, nbytes, entropy_fps = bench_gstpu(frames)
    raw = FRAMES * (W * H * 3 // 2)
    print(json.dumps({
        "metric": "1080p frames/s through the ffv1enc element "
                  "(TPU residual pass + 1 B/px download pipelined "
                  "one frame under the C++ range coder, which "
                  "re-derives contexts inline from the source plane; "
                  "conformance-gated); vs_baseline = vs libavcodec's "
                  "ffv1 encoder, same content/core.  host_core_fps = "
                  "coder-only rate on pre-materialized fields (the "
                  "PCIe-host ideal the pipeline approaches)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / av_fps, 3),
        "libav_fps": round(av_fps, 2),
        "host_core_fps": round(entropy_fps, 2),
        "host_core_vs_libav": round(entropy_fps / av_fps, 3),
        "compression": round(nbytes / raw, 3),
        "libav_compression": round(av_bytes / raw, 3),
    }))


if __name__ == "__main__":
    main()
