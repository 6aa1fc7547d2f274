"""MPEG-TS parsing + mpegtslivesrc PCR clock-slaving tests."""

import pytest

from gstpu import Buffer, Caps, State
from gstpu.codecs.mpegts import (PCR_MAX, PCR_RATE, MpegTsPcr,
                                 build_ts_packet, parse_pat, parse_pmt,
                                 parse_ts_packet,
                                 section_from_payload)
from gstpu.core.clock import TestClock
from gstpu.core.registry import make

SECOND = 10**9


def test_pcr_wraparound_tracking():
    # mirrors the reference's pcr wraparound semantics (imp.rs:1070)
    near_max = MpegTsPcr.new(PCR_MAX - PCR_RATE)      # 1s before wrap
    after = MpegTsPcr.new_with_reference(5 * PCR_RATE, near_max)
    assert after is not None and after.wraparound == 1
    assert after.to_units() == (PCR_MAX + 1) + 5 * PCR_RATE
    # going backwards across the wrap decrements
    back = MpegTsPcr.new_with_reference(PCR_MAX - PCR_RATE, after)
    assert back is not None and back.wraparound == 0
    # >15s jump is a discontinuity
    assert MpegTsPcr.new_with_reference(100 * PCR_RATE, near_max) is None


def test_packet_roundtrip_with_pcr():
    pcr = 1234567 * 300 + 89
    pkt = build_ts_packet(0x1FF, pcr=pcr, payload=b"xy", cc=5)
    hdr, af, payload = parse_ts_packet(pkt)
    assert hdr.pid == 0x1FF and hdr.cc == 5 and not hdr.pusi
    assert af["pcr"] == pcr
    assert payload == b"xy"
    with pytest.raises(ValueError):
        parse_ts_packet(b"\x00" * 188)


def _section(table_id: int, body: bytes) -> bytes:
    length = len(body) + 4                 # + CRC32
    return (bytes([table_id, 0xB0 | length >> 8, length & 0xFF])
            + body + bytes(4))


def _pat(pmt_pid: int) -> bytes:
    body = bytes([0, 1, 0xC1, 0, 0,        # tsid, version, sec, last
                  0x00, 0x01,              # program_number 1
                  0xE0 | pmt_pid >> 8, pmt_pid & 0xFF])
    return b"\x00" + _section(0x00, body)  # pointer_field 0


def _pmt(pcr_pid: int, es_pid: int) -> bytes:
    body = bytes([0, 1, 0xC1, 0, 0,
                  0xE0 | pcr_pid >> 8, pcr_pid & 0xFF,
                  0xF0, 0x00,              # program_info_length 0
                  0x1B,                    # H.264
                  0xE0 | es_pid >> 8, es_pid & 0xFF, 0xF0, 0x00])
    return b"\x00" + _section(0x02, body)


def test_pat_pmt_parse():
    pat = parse_pat(section_from_payload(_pat(0x100)))
    assert pat == {1: 0x100}
    pmt = parse_pmt(section_from_payload(_pmt(0x1FF, 0x201)))
    assert pmt.pcr_pid == 0x1FF
    assert pmt.streams == [(0x1B, 0x201)]


def _start_livesrc():
    clock = TestClock()
    el = make("mpegtslivesrc", source="appsrc")
    el.clock = clock
    el.base_time = 0
    el.set_state(State.PLAYING)
    task = el.iterate_tasks()[0]
    task.prepare()
    task.start()
    out = []
    from gstpu.core.element import (FlowReturn, Pad, PadDirection,
                                    PadPresence, PadTemplate)
    sink = Pad("cap", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    sink.chain_function = lambda pad, b: (out.append(b), FlowReturn.OK)[1]
    sink.event_function = lambda pad, ev: True
    el.static_pad("src").link(sink)
    return el, clock, task, out


def test_livesrc_slaves_clock_to_pcr():
    el, clock, task, out = _start_livesrc()
    src = el._child

    def feed(ts_bytes: bytes, pts: int):
        src.push_buffer(Buffer(ts_bytes, pts=pts))
        for _ in range(4):
            task.run_once()

    feed(build_ts_packet(0, payload=_pat(0x100), pusi=True), 0)
    feed(build_ts_packet(0x100, payload=_pmt(0x1FF, 0x201), pusi=True),
         1_000_000)
    assert el._pcr_pid == 0x1FF
    # PCR runs 1% fast vs arrival times (100ms spacing, like a real
    # mux): the slaved clock must learn the rate and stretch buffer
    # timestamps accordingly without tripping the 1s-discont guard
    for i in range(20):
        internal = i * SECOND // 10
        pcr = i * 101 * PCR_RATE // 1000   # 101 ms of PCR per 100 ms
        feed(build_ts_packet(0x1FF, pcr=pcr), internal)
    assert el.external_clock.n_observations >= 20
    last = out[-1]
    expect = el.external_clock.adjust(19 * SECOND // 10)
    assert last.pts == expect
    # rate is learned: one more second of internal time advances the
    # external clock by ~1.01s
    d = el.external_clock.adjust(3 * SECOND) - el.external_clock.adjust(
        2 * SECOND)
    assert abs(d - SECOND * 101 // 100) < SECOND // 1000
    el.set_state(State.NULL)


def test_livesrc_discont_resets():
    el, clock, task, out = _start_livesrc()
    src = el._child

    def feed(ts_bytes, pts):
        src.push_buffer(Buffer(ts_bytes, pts=pts))
        for _ in range(4):
            task.run_once()

    feed(build_ts_packet(0, payload=_pat(0x100), pusi=True), 0)
    feed(build_ts_packet(0x100, payload=_pmt(0x1FF, 0x201), pusi=True), 0)
    feed(build_ts_packet(0x1FF, pcr=0), 0)
    feed(build_ts_packet(0x1FF, pcr=PCR_RATE), SECOND)
    n = el.external_clock.n_observations
    # 100s PCR jump: discontinuity -> observations reset, DISCONT flag
    feed(build_ts_packet(0x1FF, pcr=100 * PCR_RATE), 2 * SECOND)
    from gstpu.core.buffer import BufferFlags
    assert el.external_clock.n_observations < n + 1
    assert out[-1].has_flag(BufferFlags.DISCONT)
    el.set_state(State.NULL)


def test_livesrc_requires_source():
    el = make("mpegtslivesrc")
    from gstpu.core.element import StateChangeReturn
    assert el.set_state(State.READY) is StateChangeReturn.FAILURE
