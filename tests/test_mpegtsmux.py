"""mpegtsmux + hlssink3 tests."""

import pytest

from gstpu import Buffer, Caps, State
from gstpu.codecs.mpegts import (crc32_mpeg2, parse_pat, parse_pmt,
                                 parse_ts_packet,
                                 section_from_payload)
from gstpu.core.buffer import BufferFlags
from gstpu.core.registry import make
from tests.test_mp4mux import MuxDriver

SECOND = 10**9


def _packets(data):
    assert len(data) % 188 == 0
    return [parse_ts_packet(data[i:i + 188])
            for i in range(0, len(data), 188)]


def test_mpegtsmux_stream_structure():
    mux = make("mpegtsmux")
    d = MuxDriver(mux, ["video/x-h264, stream-format=byte-stream",
                        "audio/mpeg, mpegversion=4"])
    d.push(0, b"\x00\x00\x00\x01\x65" + bytes(300), 0, SECOND // 30)
    d.push(1, b"\xff\xf1" + bytes(40), 0, SECOND // 48)
    d.push(0, b"\x00\x00\x00\x01\x41" + bytes(100), SECOND // 30,
           SECOND // 30, keyframe=False)
    d.eos()
    data = d.bytes()
    pkts = _packets(data)
    # PAT on pid 0 first, then PMT, CRCs valid
    assert pkts[0][0].pid == 0 and pkts[0][0].pusi
    pat_sec = section_from_payload(pkts[0][2])
    pat = parse_pat(pat_sec)
    assert crc32_mpeg2(pat_sec[:pat_sec[2] + 3 - 4]) \
        == int.from_bytes(pat_sec[pat_sec[2] + 3 - 4:pat_sec[2] + 3],
                          "big")
    pmt_pid = next(iter(pat.values()))
    assert pkts[1][0].pid == pmt_pid
    pmt = parse_pmt(section_from_payload(pkts[1][2]))
    assert pmt.pcr_pid == 0x100               # video pid
    assert sorted(t for t, _ in pmt.streams) == [0x0F, 0x1B]
    # video payload packets carry a PCR on the first packet
    vid = [p for p in pkts if p[0].pid == 0x100]
    assert vid[0][1] and vid[0][1]["pcr"] is not None
    # continuity counters advance per pid
    ccs = [p[0].cc for p in vid if p[0].afc & 1]
    assert ccs == [(ccs[0] + i) & 0xF for i in range(len(ccs))]
    # PES header present at start of the first video payload
    payload = vid[0][2]
    assert payload[:4] == b"\x00\x00\x01\xe0"


def test_hlssink3_segments(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sink = make("hlssink3", target_duration=1,
                playlist_location="p.m3u8")
    from gstpu.core.harness import Harness
    h = Harness(sink)
    h.set_caps("video/mpegts, systemstream=true, packetsize=188")

    def tsbuf(pts, key):
        b = Buffer(bytes(188), pts=pts, duration=SECOND // 2)
        if not key:
            b.set_flag(BufferFlags.DELTA_UNIT)
        return b

    # 4 seconds of 0.5s buffers, keyframes every second
    for i in range(8):
        h.push(tsbuf(i * SECOND // 2, key=(i % 2 == 0)))
    h.push_eos()
    pl = (tmp_path / "p.m3u8").read_text()
    assert "#EXT-X-ENDLIST" in pl
    segs = [ln for ln in pl.splitlines() if ln.endswith(".ts")]
    assert len(segs) >= 3
    for s in segs:
        assert (tmp_path / s).stat().st_size % 188 == 0
    assert "#EXTINF:1.000," in pl
    h.teardown()


def test_hlssink3_i_frames_only(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sink = make("hlssink3", target_duration=1,
                playlist_location="p.m3u8", i_frames_only=True)
    from gstpu.core.harness import Harness
    h = Harness(sink)
    h.set_caps("video/mpegts, systemstream=true, packetsize=188")
    for i in range(6):
        b = Buffer(bytes(188), pts=i * SECOND // 2,
                   duration=SECOND // 2)
        if i % 2:
            b.set_flag(BufferFlags.DELTA_UNIT)
        h.push(b)
    h.push_eos()
    pl = (tmp_path / "p.m3u8").read_text()
    assert "#EXT-X-I-FRAMES-ONLY" in pl
    segs = [ln for ln in pl.splitlines() if ln.endswith(".ts")]
    # one segment per KEYFRAME (deltas dropped): 3 keys -> 3 segments
    assert len(segs) == 3
    for s in segs:
        assert (tmp_path / s).stat().st_size == 188
    h.teardown()


def test_dashsink2_round5_knobs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sink = make("dashsink2", dynamic=True, latency=1500,
                min_buffer_time=2000, minimum_update_period=6000,
                utc_timing_url="http://time.example/xsdate",
                mpd_root_path=str(tmp_path / "out"),
                mpd_filename="live.mpd")
    from gstpu.core.harness import Harness
    h = Harness(sink)
    h.set_caps("video/quicktime")
    hdr = Buffer(b"init", pts=0)
    hdr.set_flag(BufferFlags.HEADER)
    h.push(hdr)
    h.push(Buffer(b"seg", pts=0, duration=6 * SECOND))
    mpd = (tmp_path / "out" / "live.mpd").read_text()
    assert 'type="dynamic"' in mpd
    assert 'minBufferTime="PT2.000S"' in mpd
    assert 'minimumUpdatePeriod="PT6.000S"' in mpd
    assert 'suggestedPresentationDelay="PT1.500S"' in mpd
    assert 'http-xsdate' in mpd and "time.example" in mpd
    h.push_eos()
    static = (tmp_path / "out" / "live.mpd").read_text()
    assert 'type="static"' in static
    assert "UTCTiming" not in static
    h.teardown()
