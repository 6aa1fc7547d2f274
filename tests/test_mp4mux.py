"""ISO-BMFF muxer round-trip tests (reference pattern:
mux/isobmff/tests/fmp4_tests.rs — build streams, parse them back)."""

import struct

import numpy as np
import pytest

from gstpu import Buffer, Caps, State, parse_launch
from gstpu.core.buffer import BufferFlags
from gstpu.core.caps import parse_caps
from gstpu.core.element import Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.event import (CapsEvent, EosEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.registry import make
from gstpu.mux.boxes import parse_boxes

SECOND = 1_000_000_000


class MuxDriver:
    """Feeds N synthetic streams into a mux element and captures its
    output."""

    def __init__(self, mux, caps_list):
        self.mux = mux
        self.out: list[Buffer] = []
        sink = Pad("cap", PadDirection.SINK,
                   PadTemplate("sink", PadDirection.SINK,
                               PadPresence.ALWAYS, Caps.any()))
        sink.chain_function = lambda pad, b: (self.out.append(b)
                                              or __import__("gstpu").FlowReturn.OK)
        sink.event_function = lambda pad, ev: True
        mux.static_pad("src").link(sink)
        from gstpu.core.element import State as _S
        mux.set_state(_S.PLAYING)
        self.feeders = []
        for i, caps in enumerate(caps_list):
            pad = mux.request_pad()
            feeder = Pad(f"feed{i}", PadDirection.SRC,
                         PadTemplate("src", PadDirection.SRC,
                                     PadPresence.ALWAYS, Caps.any()))
            feeder.link(pad)
            feeder.push_event(StreamStartEvent(f"s{i}"))
            feeder.push_event(CapsEvent(parse_caps(caps)))
            feeder.push_event(SegmentEvent(Segment()))
            self.feeders.append(feeder)

    def push(self, i, data, pts, dur, keyframe=True):
        b = Buffer(data, pts=pts, duration=dur)
        if not keyframe:
            b.set_flag(BufferFlags.DELTA_UNIT)
        return self.feeders[i].push(b)

    def eos(self):
        for f in self.feeders:
            f.push_event(EosEvent())

    def bytes(self):
        return b"".join(b.to_bytes() for b in self.out)


OPUS_CAPS = "audio/x-opus, rate=48000, channels=2"
H264_CAPS = ("video/x-h264, width=320, height=240, "
             "codec_data=0142c01e03010203")


def test_cmafmux_audio_fragments():
    mux = make("cmafmux", fragment_duration=100_000_000)
    d = MuxDriver(mux, [OPUS_CAPS])
    # 20ms opus packets, 300ms total -> expect multiple fragments
    for i in range(15):
        d.push(0, bytes([i]) * 10, pts=i * 20_000_000, dur=20_000_000)
    d.eos()
    data = d.bytes()
    tree = parse_boxes(data)
    names = [b.fourcc for b in tree]
    assert names[0] == "ftyp"
    assert names[1] == "moov"
    assert "moof" in names and "mdat" in names
    n_moof = names.count("moof")
    assert n_moof >= 2  # 300ms / 100ms fragments
    # moov has one trak with Opus sample entry
    moov = tree[1]
    traks = moov.find_all("trak")
    assert len(traks) == 1
    stsd = traks[0].find("mdia.minf.stbl")
    assert b"Opus" in stsd.data
    assert b"dOps" in stsd.data
    # mvex/trex present (fragmented)
    assert moov.find("mvex") is not None


def test_fmp4mux_two_streams_moof_structure():
    mux = make("isofmp4mux", fragment_duration=100_000_000)
    d = MuxDriver(mux, [OPUS_CAPS, H264_CAPS])
    for i in range(10):
        d.push(0, b"a" * 20, pts=i * 20_000_000, dur=20_000_000)
    for i in range(6):
        d.push(1, b"v" * 100, pts=i * 33_000_000, dur=33_000_000,
               keyframe=(i % 3 == 0))
    d.eos()
    tree = parse_boxes(d.bytes())
    moov = next(b for b in tree if b.fourcc == "moov")
    assert len(moov.find_all("trak")) == 2
    moofs = [b for b in tree if b.fourcc == "moof"]
    assert moofs
    # every moof has mfhd + traf(s) with tfdt/trun
    for i, mf in enumerate(moofs):
        assert mf.children[0].fourcc == "mfhd"
        seq, = struct.unpack_from(">I", mf.children[0].data, 4)
        assert seq == i + 1
        trafs = mf.find_all("traf")
        assert trafs
        for traf in trafs:
            assert traf.find("tfhd") is not None
            assert traf.find("tfdt") is not None
            assert traf.find("trun") is not None


def test_fmp4_trun_sizes_match_mdat():
    mux = make("cmafmux", fragment_duration=50_000_000)
    d = MuxDriver(mux, [OPUS_CAPS])
    sizes = [11, 22, 33, 44, 55]
    for i, n in enumerate(sizes):
        d.push(0, bytes(n), pts=i * 20_000_000, dur=20_000_000)
    d.eos()
    data = d.bytes()
    tree = parse_boxes(data)
    total_trun = 0
    total_mdat = 0
    for b in tree:
        if b.fourcc == "moof":
            trun = b.find("traf.trun")
            count, = struct.unpack_from(">I", trun.data, 4)
            for k in range(count):
                size, = struct.unpack_from(">I", trun.data,
                                           12 + 16 * k + 4)
                total_trun += size
        elif b.fourcc == "mdat":
            total_mdat += len(b.data)
    assert total_trun == total_mdat == sum(sizes)


def test_fmp4_tfdt_advances():
    mux = make("cmafmux", fragment_duration=40_000_000)
    d = MuxDriver(mux, [OPUS_CAPS])
    for i in range(9):
        d.push(0, b"x", pts=i * 20_000_000, dur=20_000_000)
    d.eos()
    tfdts = []
    for b in parse_boxes(d.bytes()):
        if b.fourcc == "moof":
            tfdt = b.find("traf.tfdt")
            bdt, = struct.unpack_from(">Q", tfdt.data, 4)
            tfdts.append(bdt)
    assert tfdts[0] == 0
    assert tfdts == sorted(tfdts)
    # decode times in 48kHz units: 40ms = 1920
    assert tfdts[1] % 960 == 0


def test_isomp4mux_full_file():
    mux = make("isomp4mux")
    d = MuxDriver(mux, [OPUS_CAPS])
    payloads = [bytes([i]) * (i + 1) for i in range(5)]
    for i, p in enumerate(payloads):
        d.push(0, p, pts=i * 20_000_000, dur=20_000_000)
    d.eos()
    data = d.bytes()
    tree = parse_boxes(data)
    names = [b.fourcc for b in tree]
    assert names == ["ftyp", "mdat", "moov"]
    mdat = tree[1]
    assert mdat.data == b"".join(payloads)
    moov = tree[2]
    stbl = moov.find("trak.mdia.minf.stbl")
    assert stbl is not None
    # stco offsets point at the right payload bytes
    stco = next(c for c in parse_boxes(stbl.data) if c.fourcc == "stco")
    n, = struct.unpack_from(">I", stco.data, 4)
    assert n == 5
    for k in range(n):
        off, = struct.unpack_from(">I", stco.data, 8 + 4 * k)
        assert data[off:off + len(payloads[k])] == payloads[k]
    # stsz sizes
    stsz = next(c for c in parse_boxes(stbl.data) if c.fourcc == "stsz")
    cnt, = struct.unpack_from(">I", stsz.data, 8)
    assert cnt == 5


def test_cmafmux_rejects_two_streams():
    mux = make("cmafmux")
    d = MuxDriver(mux, [OPUS_CAPS, OPUS_CAPS])
    d.push(0, b"x", pts=0, dur=20_000_000)
    d.push(1, b"y", pts=0, dur=20_000_000)
    d.eos()
    # single-stream constraint: no moof output, error posted
    assert not any(b.fourcc == "moof" for b in parse_boxes(d.bytes()))


def test_fragment_cut_on_keyframe():
    mux = make("isofmp4mux", fragment_duration=50_000_000)
    d = MuxDriver(mux, [H264_CAPS])
    # keyframes every 4 frames of 25ms: fragments must start at kf
    for i in range(16):
        d.push(0, bytes([i]), pts=i * 25_000_000, dur=25_000_000,
               keyframe=(i % 4 == 0))
    d.eos()
    for b in parse_boxes(d.bytes()):
        if b.fourcc == "moof":
            trun = b.find("traf.trun")
            count, = struct.unpack_from(">I", trun.data, 4)
            flags0, = struct.unpack_from(">I", trun.data, 12 + 8)
            assert flags0 == 0x02000000  # first sample is a sync sample


def test_onvifmp4mux_metadata_track():
    mux = make("onvifmp4mux")
    d = MuxDriver(mux, ["video/x-h264, width=16, height=16, "
                        "codec_data=(string)0142c01e",
                        "application/x-onvif-metadata, encoding=utf8"])
    d.push(0, b"frame", 0, SECOND // 30)
    xml = b'<tt:MetadataStream xmlns:tt="x"/>'
    d.push(1, xml, 0, SECOND)
    d.eos()
    data = d.bytes()
    tree = parse_boxes(data)
    moov = next(b for b in tree if b.fourcc == "moov")
    traks = [b for b in parse_boxes(moov.data) if b.fourcc == "trak"]
    assert len(traks) == 2
    # second trak: meta handler, nmhd header, metx sample entry
    def descend(node, path):
        for four in path:
            node = next(c for c in parse_boxes(node.data)
                        if c.fourcc == four)
        return node
    mdia = descend(traks[1], ["mdia"])
    hdlr = descend(mdia, ["hdlr"])
    assert b"meta" in hdlr.data[4:12]
    minf = descend(mdia, ["minf"])
    assert any(c.fourcc == "nmhd" for c in parse_boxes(minf.data))
    metx = descend(minf, ["stbl", "stsd"])
    assert b"metx" in metx.data
    assert b"onvif.org" in metx.data
    # the xml sample is in the mdat
    mdat = next(b for b in tree if b.fourcc == "mdat")
    assert xml in mdat.data
