"""videoconvert + image codec element tests."""

import io

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.registry import make
from gstpu.core.video import VideoInfo


def test_videoconvert_rgba_to_i420_roundtrip():
    p = parse_launch(
        "videotestsrc num-buffers=1 pattern=gradient ! "
        "video/x-raw, format=RGBA, width=64, height=48 ! "
        "videoconvert ! video/x-raw, format=I420 ! "
        "videoconvert ! video/x-raw, format=RGB ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    vi = VideoInfo.from_caps(sink.caps)
    assert vi.format == "RGB"
    rgb = vi.view(sink.pull_all()[0])
    # regenerate source to compare (4:2:0 chroma loss allowed)
    p2 = parse_launch("videotestsrc num-buffers=1 pattern=gradient ! "
                      "video/x-raw, format=RGBA, width=64, height=48 ! "
                      "appsink name=sink")
    s2 = p2.get_by_name("sink")
    p2.set_state(State.PLAYING)
    p2.run()
    src = VideoInfo.from_caps(s2.caps).view(s2.pull_all()[0])[..., :3]
    err = np.abs(rgb.astype(int) - src.astype(int))
    assert err.mean() < 6 and err.max() < 60
    p.set_state(State.NULL)
    p2.set_state(State.NULL)


def test_pngenc_produces_valid_png():
    p = parse_launch("videotestsrc num-buffers=2 pattern=smpte ! "
                     "video/x-raw, format=RGB, width=64, height=32 ! "
                     "rspngenc ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 2
    from PIL import Image
    img = Image.open(io.BytesIO(bufs[0].to_bytes()))
    assert img.size == (64, 32)
    assert bufs[0].to_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    p.set_state(State.NULL)


def test_png_roundtrip_through_imagedecoder():
    p = parse_launch("videotestsrc num-buffers=1 pattern=gradient ! "
                     "video/x-raw, format=RGB, width=32, height=16 ! "
                     "rspngenc ! imagedecoder ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    vi = VideoInfo.from_caps(sink.caps)
    assert vi.format == "RGBA"
    assert (vi.width, vi.height) == (32, 16)
    frame = vi.view(sink.pull_all()[0])
    # PNG is lossless: red channel increases along x like the gradient
    assert frame[0, 31, 0] > frame[0, 0, 0]
    p.set_state(State.NULL)


def test_gif_roundtrip():
    p = parse_launch("videotestsrc num-buffers=3 pattern=gradient ! "
                     "video/x-raw, format=RGB, width=16, height=16 ! "
                     "gifenc ! gifdec ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert len(bufs) == 3  # animated gif round-trips all frames
    vi = VideoInfo.from_caps(sink.caps)
    assert vi.format == "RGBA"
    assert bufs[1].pts > bufs[0].pts
    p.set_state(State.NULL)


def test_imageoverlay(tmp_path):
    from PIL import Image
    ov = np.zeros((8, 8, 4), np.uint8)
    ov[..., 0] = 255  # red
    ov[..., 3] = 255  # opaque
    f = tmp_path / "ov.png"
    Image.fromarray(ov, "RGBA").save(f)
    p = parse_launch(f"videotestsrc num-buffers=1 pattern=black ! "
                     f"video/x-raw, format=RGBA, width=32, height=32 ! "
                     f"imageoverlay location={f} offset-x=4 offset-y=4 "
                     f"! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    frame = VideoInfo.from_caps(sink.caps).view(sink.pull_all()[0])
    assert tuple(frame[6, 6, :3]) == (255, 0, 0)   # overlay area red
    assert tuple(frame[20, 20, :3]) == (0, 0, 0)   # rest black
    p.set_state(State.NULL)
