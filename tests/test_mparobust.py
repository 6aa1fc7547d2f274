"""rtpmparobustdepay2 (RFC 5219) tests.

Mirrors the reference's mparobust test strategy
(net/rtp/src/mparobust/tests): feed ADU-framed RTP packets, check the
reconstructed MP3 frames — including bit-reservoir backpointer
reassembly, fragmented ADUs, deinterleaving, and dummy-ADU insertion.
"""

import struct

from gstpu import Buffer, Caps, State
from gstpu.core.caps import parse_caps
from gstpu.core.event import (CapsEvent, EosEvent, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.element import Pad, PadDirection, PadPresence, PadTemplate
from gstpu.core.registry import make

# MPEG1 layer III, 128 kbit/s, 48 kHz, stereo, no CRC:
# frame_len 384, side info 32, header+side = 36, data capacity 348
HDR23 = bytes([0x94, 0x00])
CAPACITY = 348
HSI = 36


def side_info(backpointer: int) -> bytes:
    """32-byte MPEG1 side info with main_data_begin in the top 9 bits."""
    si = bytearray(32)
    si[0] = backpointer >> 1
    si[1] = (backpointer & 1) << 7
    return bytes(si)


def adu_bytes(data: bytes, backpointer: int = 0, index: int = 0xFF,
              cycle: int = 7) -> bytes:
    """One ADU frame as carried on the wire: the sync word replaced by
    the interleaving sequence number (RFC 5219 §7)."""
    b1 = (cycle << 5) | 0x1B  # restores to 0xFB: MPEG1 L3 no-CRC
    return bytes([index, b1]) + HDR23 + side_info(backpointer) + data


def descriptor(size: int, cont: bool = False, two_byte: bool = True):
    if two_byte:
        return bytes([(0x80 if cont else 0) | 0x40 | (size >> 8),
                      size & 0xFF])
    return bytes([(0x80 if cont else 0) | size])


def rtp(payload: bytes, seq: int, ts: int = 0, pt: int = 96) -> bytes:
    return struct.pack(">BBHII", 0x80, pt, seq, ts, 0x1234) + payload


class Rig:
    def __init__(self):
        self.el = make("rtpmparobustdepay2")
        self.out: list[Buffer] = []
        sink = Pad("cap", PadDirection.SINK,
                   PadTemplate("sink", PadDirection.SINK,
                               PadPresence.ALWAYS, Caps.any()))
        import gstpu
        sink.chain_function = (lambda pad, b: (self.out.append(b)
                                               or gstpu.FlowReturn.OK))
        sink.event_function = lambda pad, ev: True
        self.el.static_pad("src").link(sink)
        from gstpu.core.element import State as _S
        self.el.set_state(_S.PLAYING)
        self.feeder = Pad("feed", PadDirection.SRC,
                          PadTemplate("src", PadDirection.SRC,
                                      PadPresence.ALWAYS, Caps.any()))
        self.feeder.link(self.el.static_pad("sink"))
        self.feeder.push_event(StreamStartEvent("s"))
        self.feeder.push_event(CapsEvent(parse_caps(
            "application/x-rtp, media=audio, clock-rate=90000, "
            "encoding-name=MPA-ROBUST")))
        self.feeder.push_event(SegmentEvent(Segment()))
        self.seq = 0

    def push(self, payload: bytes):
        self.feeder.push(Buffer(rtp(payload, self.seq)))
        self.seq += 1

    def eos(self):
        self.feeder.push_event(EosEvent())

    def frames(self):
        return [b.to_bytes() for b in self.out]


def test_simple_full_adu_roundtrip():
    """ADU with backpointer 0 and full data = a complete MP3 frame."""
    rig = Rig()
    data = bytes(range(256)) + bytes(CAPACITY - 256)
    adu = adu_bytes(data)
    rig.push(descriptor(len(adu)) + adu)
    rig.eos()
    frames = rig.frames()
    assert len(frames) == 1
    f = frames[0]
    assert len(f) == 384
    assert f[:2] == b"\xff\xfb"       # restored sync word
    assert f[2:4] == HDR23
    assert f[HSI:] == data


def test_bit_reservoir_reassembly():
    """Hand-computed RFC 5219 A.2 scenario: 4 ADUs whose data regions
    straddle frame boundaries via backpointers."""
    rig = Rig()
    A = bytes([1]) * 100
    B = bytes([2]) * 300
    C = bytes([3]) * 200
    D = bytes([4]) * 100
    payload = b""
    for data, bp in ((A, 0), (B, 248), (C, 296), (D, 444)):
        adu = adu_bytes(data, bp)
        payload += descriptor(len(adu)) + adu
    rig.push(payload)
    rig.eos()
    frames = rig.frames()
    assert len(frames) == 4
    assert all(len(f) == 384 for f in frames)
    # F0: A then B's backpointed first 248 bytes
    assert frames[0][HSI:] == A + B[:248]
    # F1: rest of B, all of C, first 96 bytes of D
    assert frames[1][HSI:] == B[248:] + C + D[:96]
    # F2: final 4 bytes of D, zero-padded
    assert frames[2][HSI:] == D[96:] + bytes(CAPACITY - 4)
    # F3: no data left
    assert frames[3][HSI:] == bytes(CAPACITY)
    # side info (incl. each ADU's backpointer bits) is preserved
    assert frames[1][4] == 248 >> 1


def test_fragmented_adu():
    """One ADU split across two packets (C continuation flag)."""
    rig = Rig()
    data = bytes([7]) * CAPACITY
    adu = adu_bytes(data)
    part1, part2 = adu[:200], adu[200:]
    rig.push(descriptor(len(adu)) + part1)
    assert rig.frames() == []
    rig.push(descriptor(len(adu), cont=True) + part2)
    rig.eos()
    frames = rig.frames()
    assert len(frames) == 1
    assert frames[0][HSI:] == data


def test_one_byte_descriptor():
    """Small ADUs use the 6-bit size descriptor."""
    rig = Rig()
    # tiny data: still needs full side info; 20 bytes data
    data = bytes([9]) * 20
    adu = adu_bytes(data)
    assert len(adu) < 64
    rig.push(descriptor(len(adu), two_byte=False) + adu)
    rig.eos()
    frames = rig.frames()
    assert len(frames) == 1
    assert frames[0][HSI:HSI + 20] == data
    assert frames[0][HSI + 20:] == bytes(CAPACITY - 20)


def test_deinterleaving_restores_order():
    """ADUs sent out of order within a cycle come out sorted by
    interleave index (RFC 5219 §7 / B.2)."""
    rig = Rig()
    d0 = bytes([10]) * CAPACITY
    d1 = bytes([11]) * CAPACITY
    # transmission order: index 1, index 0 (cycle 0), then a new
    # cycle-1 ADU which releases the pending cycle sorted
    for idx, data in ((1, d1), (0, d0)):
        adu = adu_bytes(data, index=idx, cycle=0)
        rig.push(descriptor(len(adu)) + adu)
    assert rig.frames() == []   # cycle still open
    d2 = bytes([12]) * CAPACITY
    adu = adu_bytes(d2, index=0, cycle=1)
    rig.push(descriptor(len(adu)) + adu)
    rig.eos()
    frames = rig.frames()
    assert len(frames) == 3
    assert frames[0][HSI:] == d0
    assert frames[1][HSI:] == d1
    assert frames[2][HSI:] == d2


def test_dummy_adu_on_loss():
    """An ADU whose backpointer reaches past all received data forces
    dummy-ADU insertion (RFC 5219 A.2 insertDummyADUsIfNecessary)."""
    rig = Rig()
    # first (and only) ADU claims 100 bytes of reservoir that were in
    # a lost predecessor
    data = bytes([5]) * 200
    adu = adu_bytes(data, backpointer=100)
    rig.push(descriptor(len(adu)) + adu)
    rig.eos()
    frames = rig.frames()
    # a filler frame precedes the real one
    assert len(frames) == 2
    filler = frames[0]
    assert len(filler) == 384
    # filler's main_data_begin must be 0 (prev_adu_end at queue start)
    assert (((filler[4] << 8) | filler[5]) >> 7) == 0
    # the filler frame carries this ADU's backpointed 100 bytes at its
    # tail (zeros where the lost predecessor's data would have been)
    assert filler[HSI:HSI + 248] == bytes(248)
    assert filler[HSI + 248:] == data[:100]
    real = frames[1]
    # the real frame starts with this ADU's post-backpointer data
    assert real[HSI:HSI + 100] == data[100:]
    assert real[HSI + 100:] == bytes(CAPACITY - 100)


def test_pipeline_parse_launch():
    from gstpu import parse_launch
    p = parse_launch("appsrc name=src caps=\"application/x-rtp, "
                     "media=audio, clock-rate=90000, "
                     "encoding-name=MPA-ROBUST\" ! "
                     "rtpmparobustdepay2 ! appsink name=out")
    src = p.get_by_name("src")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    data = bytes([3]) * CAPACITY
    adu = adu_bytes(data)
    src.push_buffer(Buffer(rtp(descriptor(len(adu)) + adu, 0)))
    src.end_of_stream()
    p.run()
    bufs = out.pull_all()
    assert len(bufs) == 1
    assert bufs[0].to_bytes()[HSI:] == data
    assert "parsed=true" in str(out.caps).replace(" ", "").lower() \
        or out.caps[0].get("parsed") in (True, "true", 1)
    p.set_state(State.NULL)


def test_crc_protected_backpointer_offset():
    """Review regression: with protection on (CRC present) the
    main_data_begin sits after the 2-byte CRC, not at byte 4."""
    from gstpu.net.rtp.mparobust import Adu
    # byte1 = 0xFA: MPEG1 L3 WITH CRC (protection bit 0)
    si = bytearray(32)
    bp = 100
    si[0] = bp >> 1
    si[1] = (bp & 1) << 7
    raw = (bytes([0xFF, 0xFA, 0x94, 0x00])
           + b"\xde\xad"           # CRC bytes (would alias bp=445)
           + bytes(si) + bytes([7]) * 50)
    adu = Adu.parse(raw)
    assert adu is not None
    assert adu.backpointer == 100    # read after the CRC
    assert adu.header_side_info_len == 4 + 32 + 2


def test_oversized_adu_payload_truncates_not_crashes():
    rig = Rig()
    # payload far larger than the header's frame_len: must not raise
    data = bytes([9]) * (CAPACITY + 500)
    adu = adu_bytes(data)
    rig.push(descriptor(len(adu)) + adu)
    rig.eos()
    frames = rig.frames()
    assert frames and all(len(f) == 384 for f in frames)


def test_zero_capacity_adu_dropped():
    """Free-format header crafted so frame_len == header+side info:
    must be dropped, not loop forever inserting dummies."""
    from gstpu.net.rtp.mparobust import Adu
    # free format (bitrate_idx=0) + a matching sync at offset 36
    head = bytes([0xFF, 0xFB, 0x04, 0x00])
    si = bytes(32)
    raw = head + si + head + bytes(20)
    adu = Adu.parse(raw)
    # either parsed with positive capacity or rejected — and feeding
    # it through the element must terminate
    rig = Rig()
    rig.push(descriptor(len(raw)) + raw)
    rig.eos()           # completes without hanging
