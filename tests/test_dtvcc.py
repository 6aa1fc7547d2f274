"""CEA-708 DTVCC window/pen state machine (VERDICT r1 #7): golden
tests for multi-window captions, pen positioning, scrolling, window
lifecycle and the overlay's anchor-geometry rendering (reference
video/closedcaption/src/cea708utils.rs)."""

import numpy as np

from gstpu.codecs.cea708 import build_dtvcc, cc_triplet
from gstpu.codecs.dtvcc import (CLW, DF0, DLW, DSW, HDW, RST, SPL, SWA,
                                TGW, DtvccDecoder, Service708)


def define_window(idx=0, visible=True, anchor_v=74, anchor_h=105,
                  anchor_point=8, rows=2, cols=31):
    return bytes([
        DF0 + idx,
        (0x20 if visible else 0) | 0x3,            # priority 3
        anchor_v & 0x7F,
        anchor_h & 0xFF,
        (anchor_point << 4) | (rows - 1),
        cols - 1,
        0x11,                                      # styles
    ])


def test_define_write_read_back():
    s = Service708()
    s.feed(define_window(0, rows=2, cols=20) + b"HELLO")
    w = s.windows[0]
    assert w.defined and w.visible
    assert (w.rows, w.cols) == (2, 20)
    assert w.text() == "HELLO"
    assert (w.pen.row, w.pen.col) == (0, 5)


def test_carriage_return_and_rollup_scroll():
    s = Service708()
    s.feed(define_window(0, rows=2, cols=10))
    s.feed(b"ONE\rTWO\rTRE")
    w = s.windows[0]
    # 2 rows, bottom-to-top scroll: ONE scrolled out
    assert w.text_rows()[0] == "TWO"
    assert w.text_rows()[1] == "TRE"


def test_pen_location_spl():
    s = Service708()
    s.feed(define_window(0, rows=4, cols=16))
    s.feed(bytes([SPL, 2, 5]) + b"X")
    w = s.windows[0]
    assert w.grid[2][5] == "X"


def test_multi_window():
    s = Service708()
    s.feed(define_window(0, rows=1, cols=10, anchor_point=0))
    s.feed(b"TOP")
    s.feed(define_window(1, rows=1, cols=10, anchor_point=8))
    s.feed(b"BOTTOM")
    assert s.windows[0].text() == "TOP"
    assert s.windows[1].text() == "BOTTOM"
    # window commands address windows by bitmap
    s.feed(bytes([HDW, 0b01]))          # hide window 0
    assert not s.windows[0].visible and s.windows[1].visible
    s.feed(bytes([TGW, 0b11]))          # toggle both
    assert s.windows[0].visible and not s.windows[1].visible
    s.feed(bytes([CLW, 0b01]))          # clear window 0 text
    assert s.windows[0].text() == ""
    assert s.windows[1].text() == "BOTTOM"
    s.feed(bytes([DLW, 0b10]))          # delete window 1
    assert not s.windows[1].defined


def test_backspace_ff_hcr_reset():
    s = Service708()
    s.feed(define_window(0, rows=2, cols=10))
    s.feed(b"ABC\x08")                  # BS erases C
    assert s.windows[0].text() == "AB"
    s.feed(b"\x0C")                     # FF clears + homes
    assert s.windows[0].text() == ""
    assert (s.windows[0].pen.row, s.windows[0].pen.col) == (0, 0)
    s.feed(b"XY\x0EZ")                  # HCR erases row, pen col 0
    assert s.windows[0].text() == "Z"
    s.feed(bytes([RST]))
    assert not s.windows[0].defined


def test_window_attributes_swa():
    s = Service708()
    s.feed(define_window(0))
    s.feed(bytes([SWA, 0b11_000010, 0, 0b0_1_00_01_10, 0]))
    w = s.windows[0]
    assert w.fill_opacity == 3 and w.fill_color == 2
    assert w.wordwrap and w.scroll_dir == 1 and w.justify == 2
    assert w.print_dir == 0


def test_g1_and_ext1_g2():
    s = Service708()
    s.feed(define_window(0, cols=12))
    s.feed("CAF".encode("latin-1") + bytes([0xC9]))   # É via G1
    s.feed(bytes([0x10, 0x25]))                       # EXT1 ellipsis
    assert s.windows[0].text() == "CAFÉ…"


def _cc_data_for(blocks):
    pkt = build_dtvcc(0, blocks)
    if len(pkt) % 2:
        pkt += b"\x00"
    out = bytearray()
    for k in range(0, len(pkt), 2):
        t = 3 if k == 0 else 2
        out += cc_triplet(pkt[k], pkt[k + 1], t)
    return bytes(out)


def test_decoder_packet_reassembly_from_cc_data():
    dec = DtvccDecoder()
    svc_payload = define_window(0, rows=1, cols=16) + b"HI 708"
    dec.feed_cc_data(_cc_data_for([(1, svc_payload)]))
    wins = dec.visible_windows(1)
    assert len(wins) == 1
    assert wins[0][1] == "HI 708"


def test_overlay_renders_multiwindow_anchored():
    """Two visible windows (top-left and bottom-right anchors) modify
    the expected frame regions."""
    from gstpu.core.registry import make
    from gstpu.core.harness import Harness
    from gstpu.core.video import VideoCaptionMeta, VideoInfo
    el = make("cea708overlay")
    h = Harness(el)
    h.set_caps("video/x-raw, format=RGB, width=320, height=180")
    vi = VideoInfo("RGB", 320, 180)
    frame = np.zeros((180, 320, 3), np.uint8)
    payload = (define_window(0, rows=1, cols=8, anchor_point=0,
                             anchor_v=0, anchor_h=0) + b"UP" +
               define_window(1, rows=1, cols=8, anchor_point=8,
                             anchor_v=74, anchor_h=209) + b"DOWN")
    buf = vi.make_buffer(frame)
    buf.add_meta(VideoCaptionMeta("cea708-raw",
                                  _cc_data_for([(1, payload)])))
    h.push(buf)
    out = vi.view(h.pull())
    top_left = out[:30, :80].sum()
    bottom_right = out[-30:, -80:].sum()
    center = out[80:100, 140:180].sum()
    assert top_left > 0 and bottom_right > 0
    assert center == 0
    h.teardown()
