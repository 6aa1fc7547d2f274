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


# ---------------------------------------------------------------------------
# isobmff depth features (reference boxes.rs/ac3.rs/uncompressed.rs/
# precision_timestamps.rs/aux_info.rs parity)
# ---------------------------------------------------------------------------

def _descend(node, path):
    for four in path:
        node = next(c for c in parse_boxes(node.data) if c.fourcc == four)
    return node


def _make_ac3_frame():
    """Synthetic AC-3 syncframe header: fscod=0 (48k), frmsizecod=20,
    bsid=8, bsmod=0, acmod=2 (stereo), dsurmod=0, lfeon=0."""
    return bytes([0x0B, 0x77, 0x00, 0x00, 0x14, 0x40, 0x40]) + bytes(32)


def test_ac3_dac3_sample_entry():
    mux = make("isomp4mux")
    d = MuxDriver(mux, ["audio/x-ac3, rate=48000, channels=2"])
    frame = _make_ac3_frame()
    d.push(0, frame, pts=0, dur=32_000_000)
    d.push(0, frame, pts=32_000_000, dur=32_000_000)
    d.eos()
    tree = parse_boxes(d.bytes())
    moov = next(b for b in tree if b.fourcc == "moov")
    stsd = _descend(moov, ["trak", "mdia", "minf", "stbl", "stsd"])
    assert b"ac-3" in stsd.data
    i = stsd.data.index(b"dac3")
    payload = stsd.data[i + 4:i + 7]
    bits = int.from_bytes(payload, "big")
    assert (bits >> 22) & 0x3 == 0          # fscod
    assert (bits >> 17) & 0x1F == 8         # bsid
    assert (bits >> 14) & 0x7 == 0          # bsmod
    assert (bits >> 11) & 0x7 == 2          # acmod
    assert (bits >> 10) & 0x1 == 0          # lfeon
    assert (bits >> 5) & 0x1F == 10         # bit_rate_code = frmsizecod>>1


def test_eac3_dec3_sample_entry():
    # strmtyp=0 substreamid=0 frmsiz=191 fscod=0 numblkscod=3 acmod=2
    # lfeon=0 bsid=16
    bits = (0 << 54) | (0 << 51) | (191 << 40) | (0 << 38) | (3 << 36) \
        | (2 << 33) | (0 << 32) | (16 << 27)
    frame = bytes([0x0B, 0x77]) + bits.to_bytes(7, "big") + bytes(32)
    mux = make("isomp4mux")
    d = MuxDriver(mux, ["audio/x-eac3, rate=48000, channels=2"])
    d.push(0, frame, pts=0, dur=32_000_000)
    d.eos()
    moov = next(b for b in parse_boxes(d.bytes()) if b.fourcc == "moov")
    stsd = _descend(moov, ["trak", "mdia", "minf", "stbl", "stsd"])
    assert b"ec-3" in stsd.data
    i = stsd.data.index(b"dec3")
    data_rate = struct.unpack_from(">H", stsd.data, i + 4)[0] >> 3
    assert data_rate == 96  # 384 bytes * 8 bits * 48000 / (256*6) / 1000


def test_raw_audio_ipcm_pcmc_chnl():
    mux = make("isomp4mux")
    d = MuxDriver(mux, ["audio/x-raw, format=S16LE, rate=48000, "
                        "channels=2"])
    d.push(0, bytes(192), pts=0, dur=1_000_000)
    d.eos()
    moov = next(b for b in parse_boxes(d.bytes()) if b.fourcc == "moov")
    stsd = _descend(moov, ["trak", "mdia", "minf", "stbl", "stsd"])
    assert b"ipcm" in stsd.data
    i = stsd.data.index(b"pcmC")
    # fullbox(4) + format_flags(1)=little endian + sample size(1)=16
    assert stsd.data[i + 8] == 1
    assert stsd.data[i + 9] == 16
    assert b"chnl" in stsd.data


def test_raw_audio_fpcm():
    mux = make("isomp4mux")
    d = MuxDriver(mux, ["audio/x-raw, format=F32LE, rate=48000, "
                        "channels=1"])
    d.push(0, bytes(192), pts=0, dur=1_000_000)
    d.eos()
    moov = next(b for b in parse_boxes(d.bytes()) if b.fourcc == "moov")
    stsd = _descend(moov, ["trak", "mdia", "minf", "stbl", "stsd"])
    assert b"fpcm" in stsd.data
    i = stsd.data.index(b"pcmC")
    assert stsd.data[i + 9] == 32


def test_uncompressed_video_rgba_v1():
    mux = make("isomp4mux")
    d = MuxDriver(mux, ["video/x-raw, format=RGBA, width=4, height=4"])
    d.push(0, bytes(64), pts=0, dur=33_000_000)
    d.eos()
    moov = next(b for b in parse_boxes(d.bytes()) if b.fourcc == "moov")
    stsd = _descend(moov, ["trak", "mdia", "minf", "stbl", "stsd"])
    assert b"uncv" in stsd.data
    i = stsd.data.index(b"uncC")
    # v1 header-only uncC: version 1, profile 'rgba'
    assert stsd.data[i + 4] == 1
    assert stsd.data[i + 8:i + 12] == b"rgba"
    assert b"cmpd" not in stsd.data


def test_uncompressed_video_i420_v0():
    mux = make("isomp4mux")
    d = MuxDriver(mux, ["video/x-raw, format=I420, width=4, height=4"])
    d.push(0, bytes(24), pts=0, dur=33_000_000)
    d.eos()
    moov = next(b for b in parse_boxes(d.bytes()) if b.fourcc == "moov")
    stsd = _descend(moov, ["trak", "mdia", "minf", "stbl", "stsd"])
    assert b"uncv" in stsd.data and b"cmpd" in stsd.data
    i = stsd.data.index(b"cmpd")
    ncomp, = struct.unpack_from(">I", stsd.data, i + 4)
    assert ncomp == 3
    comps = struct.unpack_from(">3H", stsd.data, i + 8)
    assert comps == (1, 2, 3)  # Luma, Cb, Cr
    j = stsd.data.index(b"uncC")
    assert stsd.data[j + 4] == 0  # version 0
    body = stsd.data[j + 8:]
    # profile 'i420', 3 components, then sampling=2 (4:2:0) planar=0
    assert body[:4] == b"i420"
    n, = struct.unpack_from(">I", body, 4)
    assert n == 3
    # entries are 5 bytes: u16 index + depth-1 + format + align
    off = 8 + 3 * 5
    assert body[off] == 2      # sampling_type 4:2:0
    assert body[off + 1] == 0  # interleave component (planar)


def test_precision_timestamps_taic_stai():
    from gstpu.core.buffer import ReferenceTimestampMeta
    mux = make("isomp4mux", with_precision_timestamps=True)
    d = MuxDriver(mux, [OPUS_CAPS])
    tais = [1_000_000_000_000, 1_000_000_020_000, 1_000_000_040_000]
    for i, tai in enumerate(tais):
        b = Buffer(bytes([i]) * 8, pts=i * 20_000_000, duration=20_000_000)
        b.add_meta(ReferenceTimestampMeta("timestamp/x-tai1958", tai))
        d.feeders[0].push(b)
    d.eos()
    data = d.bytes()
    moov = next(b for b in parse_boxes(data) if b.fourcc == "moov")
    stbl = _descend(moov, ["trak", "mdia", "minf", "stbl"])
    # taic in the sample entry
    assert b"taic" in stbl.data
    children = parse_boxes(stbl.data)
    saiz = next(c for c in children if c.fourcc == "saiz")
    # flags=1 -> aux_info_type 'stai'
    assert saiz.data[4:8] == b"stai"
    default_size, count = struct.unpack_from(">BI", saiz.data, 12)
    assert default_size == 9 and count == 3
    saio = next(c for c in children if c.fourcc == "saio")
    assert saio.data[4:8] == b"stai"
    n_off, off = struct.unpack_from(">II", saio.data, 12)
    assert n_off == 1
    # aux packets live in the file at `off`: 9-byte TAITimestampPackets
    for k, tai in enumerate(tais):
        ts, flags = struct.unpack_from(">QB", data, off + 9 * k)
        assert ts == tai
        assert flags & 0x80  # synchronized


def test_precision_timestamps_fallback_packet():
    mux = make("isomp4mux", with_precision_timestamps=True)
    d = MuxDriver(mux, [OPUS_CAPS])
    d.push(0, b"x" * 8, pts=0, dur=20_000_000)  # no TAI meta
    d.eos()
    data = d.bytes()
    moov = next(b for b in parse_boxes(data) if b.fourcc == "moov")
    stbl = _descend(moov, ["trak", "mdia", "minf", "stbl"])
    saio = next(c for c in parse_boxes(stbl.data) if c.fourcc == "saio")
    _, off = struct.unpack_from(">II", saio.data, 12)
    ts, flags = struct.unpack_from(">QB", data, off)
    assert flags & 0x40  # generation failure
    assert ts == 1       # last_tai + 1


def test_edit_list_gap_and_shift():
    mux = make("isomp4mux")
    d = MuxDriver(mux, [OPUS_CAPS, OPUS_CAPS])
    # stream 0 starts at 0, stream 1 starts 100ms later -> gap edit
    for i in range(5):
        d.push(0, b"a", pts=i * 20_000_000, dur=20_000_000)
    for i in range(5):
        d.push(1, b"b", pts=100_000_000 + i * 20_000_000,
               dur=20_000_000)
    d.eos()
    moov = next(b for b in parse_boxes(d.bytes()) if b.fourcc == "moov")
    traks = moov.find_all("trak")
    assert len(traks) == 2
    elst1 = _descend(traks[1], ["edts", "elst"])
    nentries, = struct.unpack_from(">I", elst1.data, 4)
    assert nentries == 2
    # entry 0: empty edit (media_time == -1), duration 100ms in movie ts
    dur0, mt0 = struct.unpack_from(">Qq", elst1.data, 8)
    assert mt0 == -1
    assert dur0 == 100  # 100ms in movie timescale 1000
    # entry 1: the actual media, starting at media time 0 (no dts
    # shift), presentation duration 100ms -> 100 movie-ts units
    dur1, mt1 = struct.unpack_from(">Qq", elst1.data, 8 + 20)
    assert mt1 == 0
    assert dur1 == 100


def test_ctts_cslg_composition_offsets():
    mux = make("isomp4mux")
    d = MuxDriver(mux, [H264_CAPS])
    # IPB-ish pattern: dts always 33ms apart, pts reordered
    frames = [(0, 0), (33, 99), (66, 66), (99, 132)]  # (dts, pts) ms
    for k, (dts, pts) in enumerate(frames):
        b = Buffer(bytes([k]) * 10, pts=pts * 1_000_000,
                   dts=dts * 1_000_000, duration=33_000_000)
        if k:
            b.set_flag(BufferFlags.DELTA_UNIT)
        d.feeders[0].push(b)
    d.eos()
    moov = next(b for b in parse_boxes(d.bytes()) if b.fourcc == "moov")
    stbl = _descend(moov, ["trak", "mdia", "minf", "stbl"])
    children = parse_boxes(stbl.data)
    ctts = next(c for c in children if c.fourcc == "ctts")
    assert ctts.data[0] == 1  # version 1 (signed offsets)
    n, = struct.unpack_from(">I", ctts.data, 4)
    offs = []
    for k in range(n):
        cnt, off = struct.unpack_from(">Ii", ctts.data, 8 + 8 * k)
        offs.extend([off] * cnt)
    expect = [(p - dt) * 1_000_000 * 90000 // SECOND for dt, p in frames]
    assert offs == expect
    assert any(c.fourcc == "cslg" for c in children)


def test_fmp4_header_rewrite_with_mehd(tmp_path):
    from gstpu.core.element import State as _S
    from gstpu.core.registry import make as _make
    path = str(tmp_path / "out.mp4")
    mux = make("isofmp4mux", fragment_duration=40_000_000,
               header_update_mode="rewrite", write_mehd=True)
    sink = _make("filesink", location=path)
    mux.static_pad("src").link(sink.static_pad("sink"))
    sink.set_state(_S.PLAYING)
    d = MuxDriver.__new__(MuxDriver)
    d.mux = mux
    d.out = []
    mux.set_state(_S.PLAYING)
    pad = mux.request_pad()
    feeder = Pad("feed0", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("s0"))
    feeder.push_event(CapsEvent(parse_caps(OPUS_CAPS)))
    feeder.push_event(SegmentEvent(Segment()))
    for i in range(10):
        feeder.push(Buffer(b"x" * 10, pts=i * 20_000_000,
                           duration=20_000_000))
    feeder.push_event(EosEvent())
    sink.set_state(_S.NULL)
    data = open(path, "rb").read()
    tree = parse_boxes(data)
    moov = next(b for b in tree if b.fourcc == "moov")
    # rewritten mvhd has the real duration (200ms in movie ts 1000)
    mvhd = next(c for c in parse_boxes(moov.data) if c.fourcc == "mvhd")
    dur, = struct.unpack_from(">I", mvhd.data, 16)
    assert dur == 200
    mvex = moov.find("mvex")
    mehd = next(c for c in parse_boxes(mvex.data) if c.fourcc == "mehd")
    mehd_dur, = struct.unpack_from(">Q", mehd.data, 4)
    assert mehd_dur == 200
    # fragments still intact after the rewrite
    assert any(b.fourcc == "moof" for b in tree)


def test_interleave_bytes_chunks_runs():
    """interleave-bytes splits each stream's fragment share into
    chunks emitted round-robin — one traf/trun per chunk (reference
    fmp4mux interleave-bytes/interleave-time)."""
    mux = make("isofmp4mux", fragment_duration=int(0.5 * SECOND),
               interleave_bytes=200)
    d = MuxDriver(mux, [
        "video/x-h264, width=64, height=64, codec_data=0142c01e",
        "audio/x-opus, rate=48000, channels=2",
    ])
    for i in range(8):
        d.push(0, bytes(250), pts=i * SECOND // 4, dur=SECOND // 4)
        d.push(1, bytes(120), pts=i * SECOND // 4, dur=SECOND // 4)
    d.eos()
    frags = [b.to_bytes() for b in d.out[1:]]
    assert frags
    saw_multi = False
    for frag in frags:
        moof = [b for b in parse_boxes(frag) if b.fourcc == "moof"]
        if not moof:
            continue
        trafs = moof[0].find_all("traf")
        ids = [struct.unpack(">I", t.find("tfhd").data[4:8])[0]
               for t in trafs]
        # chunks alternate between the two tracks
        if len(trafs) > 2:
            saw_multi = True
            assert ids != sorted(ids) or len(set(ids)) < len(ids)
        # every trun's sizes sum to the mdat payload
        mdat = [b for b in parse_boxes(frag) if b.fourcc == "mdat"][0]
        total = 0
        for t in trafs:
            tr = t.find("trun")
            n = struct.unpack(">I", tr.data[4:8])[0]
            for k in range(n):
                total += struct.unpack(
                    ">I", tr.data[12 + 16 * k + 4:12 + 16 * k + 8])[0]
        assert total == len(mdat.data)
    assert saw_multi


def test_cenc_protected_stream_skeleton():
    """application/x-cenc input: the sample entry wraps encv + sinf
    (frma/schm cenc/tenc with KID), and each fragment carries
    senc + saiz + saio auxiliary info from the per-buffer
    CencAuxMeta (ISO/IEC 23001-7; reference fmp4mux cenc aux)."""
    from gstpu.core.caps import Structure
    from gstpu.elements.mux.fmp4 import CencAuxMeta

    kid = bytes(range(16))
    mux = make("isofmp4mux", fragment_duration=10 * SECOND)
    d = MuxDriver.__new__(MuxDriver)
    d.mux = mux
    d.out = []
    sink = Pad("cap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    sink.chain_function = lambda pad, b: (d.out.append(b)
                                          or __import__("gstpu").FlowReturn.OK)
    sink.event_function = lambda pad, ev: True
    mux.static_pad("src").link(sink)
    mux.set_state(State.PLAYING)
    pad = mux.request_pad()
    feeder = Pad("feed0", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("s0"))
    feeder.push_event(CapsEvent(Caps([Structure(
        "application/x-cenc",
        **{"original-media-type": "video/x-h264",
           "kid": kid.hex(), "iv-size": 8,
           "width": 64, "height": 64,
           "codec_data": bytes.fromhex("0142")})])))
    feeder.push_event(SegmentEvent(Segment()))
    ivs = [bytes([i] * 8) for i in range(1, 4)]
    for i, iv in enumerate(ivs):
        b = Buffer(bytes(100 + i), pts=i * SECOND, duration=SECOND)
        b.add_meta(CencAuxMeta(iv, [(10, 90 + i)]))
        feeder.push(b)
    feeder.push_event(EosEvent())

    header = d.out[0].to_bytes()
    moov = [b for b in parse_boxes(header) if b.fourcc == "moov"][0]
    stsd = _descend(moov, ["trak", "mdia", "minf", "stbl",
                          "stsd"])
    assert b"encv" in stsd.data
    assert b"frma" in stsd.data and b"avc1" in stsd.data
    assert b"schm" in stsd.data and b"cenc" in stsd.data
    tenc_at = stsd.data.index(b"tenc")
    # tenc: ver/flags(4) reserved(1) pattern(1) isProtected(1)
    # iv_size(1) KID(16)
    tenc = stsd.data[tenc_at + 4:]
    assert tenc[4 + 2] == 1            # default_isProtected
    assert tenc[4 + 3] == 8            # Per_Sample_IV_Size
    assert tenc[4 + 4:4 + 20] == kid

    frag = b"".join(b.to_bytes() for b in d.out[1:])
    boxes_ = parse_boxes(frag)
    moof = [b for b in boxes_ if b.fourcc == "moof"][0]
    traf = moof.find("traf")
    sb = traf.find("senc")
    assert sb is not None
    n = struct.unpack(">I", sb.data[4:8])[0]
    assert n == len(ivs)
    # flags bit 2: subsample encryption present
    assert sb.data[3] & 0x2
    # first entry: IV + subsample count + (clear, enc)
    assert sb.data[8:16] == ivs[0]
    assert struct.unpack(">H", sb.data[16:18])[0] == 1
    assert struct.unpack(">HI", sb.data[18:24]) == (10, 90)
    assert traf.find("saiz") is not None
    saio_b = traf.find("saio")
    assert saio_b is not None
    # saio (v1, aux-type present): offset -> first senc entry,
    # relative to moof start (default-base-is-moof)
    off = struct.unpack(">Q", saio_b.data[16:24])[0]
    moof_bytes = frag[moof.offset:moof.offset + moof.size]
    assert moof_bytes[off:off + 8] == ivs[0]


def test_cmaf_chunk_mode_low_latency():
    """chunk-duration emits a moof+mdat per chunk WITHOUT waiting for
    the fragment boundary: styp + keyframe flag only on
    fragment-opening chunks, delta chunks in between, fragments still
    cut at keyframes every fragment-duration (CMAF LL; reference
    fmp4mux chunk-duration)."""
    mux = make("cmafmux", fragment_duration=SECOND,
               chunk_duration=SECOND // 4)
    d = MuxDriver(mux, [
        "video/x-h264, width=64, height=64, codec_data=0142c01e",
    ])
    # 2s of 4 fps video, keyframe every second (every 4th frame)
    for i in range(8):
        d.push(0, bytes(200), pts=i * SECOND // 4, dur=SECOND // 4,
               keyframe=(i % 4 == 0))
    d.eos()
    frags = d.out[1:]
    # 8 frames / 1 frame per chunk-duration -> ~8 chunks
    assert len(frags) >= 6
    stypes, kf_flags = 0, []
    for b in frags:
        raw = b.to_bytes()
        names = [x.fourcc for x in parse_boxes(raw)]
        assert "moof" in names and "mdat" in names
        has_styp = "styp" in names
        stypes += has_styp
        meta = [m for m in b.metas
                if type(m).__name__ == "FMP4KeyframeMeta"]
        kf = bool(meta and meta[0].keyframe)
        kf_flags.append(kf)
        # styp exactly on fragment-opening (keyframe) chunks
        assert has_styp == kf
        assert b.has_flag(BufferFlags.DELTA_UNIT) != kf
    # exactly 2 fragments were opened (keyframes at 0s and 1s)
    assert stypes == 2
    assert kf_flags[0] is True
    # decode times stay contiguous across chunks
    tfdts = []
    for b in frags:
        raw = b.to_bytes()
        moof = [x for x in parse_boxes(raw) if x.fourcc == "moof"][0]
        tfdt = moof.find("traf").find("tfdt")
        tfdts.append(struct.unpack(">Q", tfdt.data[4:12])[0])
    assert tfdts == sorted(tfdts)
    assert tfdts[0] == 0


def test_cmaf_chunk_mode_async_stream_boundaries():
    """Streams reach the fragment boundary at different drain rounds
    (different block durations): the fragment-opening keyframe must
    never leak into a mid-fragment chunk — a stream AT the boundary
    waits until every stream arrives, then the next chunk opens the
    fragment with styp."""
    mux = make("isofmp4mux", fragment_duration=SECOND,
               chunk_duration=SECOND // 5)
    d = MuxDriver(mux, [
        "video/x-h264, width=64, height=64, codec_data=0142c01e",
        "audio/x-opus, rate=48000, channels=2",
    ])
    n_v, n_a = 20, 13                       # 2s of each
    for i in range(max(n_v, n_a)):
        if i < n_v:                          # 10 fps video, kf @ 0,1s
            d.push(0, bytes(180), pts=i * SECOND // 10,
                   dur=SECOND // 10, keyframe=(i % 10 == 0))
        if i < n_a:                          # 160ms audio blocks
            d.push(1, bytes(90), pts=i * 160_000_000,
                   dur=160_000_000)
    d.eos()
    frags = d.out[1:]
    assert len(frags) >= 6
    stypes = 0
    for b in frags:
        raw = b.to_bytes()
        boxes_ = parse_boxes(raw)
        names = [x.fourcc for x in boxes_]
        has_styp = "styp" in names
        stypes += has_styp
        # fragment-opening chunks carry the keyframe flag; only they
        # may start with a video keyframe sample
        kf_flag = not b.has_flag(BufferFlags.DELTA_UNIT)
        assert has_styp == kf_flag
        if has_styp:
            moof = [x for x in boxes_ if x.fourcc == "moof"][0]
            trafs = moof.find_all("traf")
            ids = [struct.unpack(">I", t.find("tfhd").data[4:8])[0]
                   for t in trafs]
            assert 1 in ids                 # video present at open
    assert stypes == 2                      # keyframes at 0s and 1s
