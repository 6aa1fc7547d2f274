"""cea608overlay tests."""

import numpy as np
import pytest

from gstpu import Buffer
from gstpu.codecs.cea608 import Cea608Encoder
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.core.video import VideoCaptionMeta, VideoInfo


def _frame(vi, val=0):
    return np.full((vi.height, vi.width, 4), val, np.uint8)


def test_overlay_renders_after_eoc():
    vi = VideoInfo("RGBA", 160, 120)
    h = Harness(make("cea608overlay", black_background=True))
    h.set_caps("video/x-raw, format=RGBA, width=160, height=120, "
               "framerate=30/1")
    pairs = Cea608Encoder().encode_popon("HI")
    # all pairs on the first frame's meta
    b = vi.make_buffer(_frame(vi))
    b.add_meta(VideoCaptionMeta("cea608-raw", b"".join(pairs)))
    h.push(b)
    out1 = vi.view(h.pull())
    assert out1.any()                      # caption burned in
    # bottom half has the white text / black box, top stays black
    assert out1[:40].sum() == 0
    assert (out1[60:, :, :3] >= 200).any()  # AA'd glyphs
    # caption persists on later frames without metas
    h.push(vi.make_buffer(_frame(vi)))
    out2 = vi.view(h.pull())
    assert (out2 == out1).all()
    h.teardown()


def test_overlay_no_caption_passthrough():
    vi = VideoInfo("RGBA", 64, 48)
    h = Harness(make("cea608overlay"))
    h.set_caps("video/x-raw, format=RGBA, width=64, height=48, "
               "framerate=30/1")
    f = _frame(vi, val=7)
    h.push(vi.make_buffer(f))
    assert (vi.view(h.pull()) == 7).all()
    h.teardown()


def test_overlay_cea708_raw_meta():
    from gstpu.codecs.cea708 import cc_data_from_608
    vi = VideoInfo("RGBA", 160, 120)
    h = Harness(make("cea608overlay"))
    h.set_caps("video/x-raw, format=RGBA, width=160, height=120, "
               "framerate=30/1")
    pairs = Cea608Encoder().encode_popon("X")
    b = vi.make_buffer(_frame(vi))
    b.add_meta(VideoCaptionMeta("cea708-raw",
                                cc_data_from_608(pairs)))
    h.push(b)
    assert vi.view(h.pull()).any()
    h.teardown()


def test_cea708_overlay_service_text():
    from gstpu.codecs.cea708 import (build_dtvcc, dtvcc_to_ccdata,
                                     service_block_text)
    # service text extraction handles window commands + CR
    data = b"\x98" + bytes(6) + b"HI\x0dTHERE\x03"
    assert service_block_text(data) == "HI\nTHERE"

    vi = VideoInfo("RGBA", 160, 120)
    h = Harness(make("cea708overlay", service=2,
                     black_background=True))
    h.set_caps("video/x-raw, format=RGBA, width=160, height=120, "
               "framerate=30/1")
    cc = dtvcc_to_ccdata(build_dtvcc(0, [(1, b"WRONG"),
                                         (2, b"RIGHT\x03")]))
    b = vi.make_buffer(_frame(vi))
    b.add_meta(VideoCaptionMeta("cea708-raw", cc))
    h.push(b)
    out = vi.view(h.pull())
    assert out.any()
    h.teardown()
