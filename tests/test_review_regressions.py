"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

from gstpu import Buffer, FlowReturn
from gstpu.core.caps import IntRange, _intersect_values
from gstpu.core.registry import make


def test_intrange_phase_intersection():
    # evens ∩ odds is empty
    assert _intersect_values(IntRange(0, 100, 2),
                             IntRange(1, 101, 2)) is None
    # stepped ∩ unstepped keeps the step
    assert _intersect_values(IntRange(0, 100, 2),
                             IntRange(1, 99)) == IntRange(2, 98, 2)
    # CRT case
    assert _intersect_values(IntRange(1, 100, 3),
                             IntRange(0, 100, 2)) == IntRange(4, 100, 6)


def test_rtprecv_multiple_ssrcs_dont_collide():
    from gstpu.core.harness import Harness
    from gstpu.net.rtp.packet import RtpPacket

    recv = make("rtprecv", latency=0)
    h = Harness(recv, sink_pad="rtp_sink", src_pad="rtp_src")
    h.set_caps("application/x-rtp")
    payloads = {}
    for ssrc in (0xAAAA, 0xBBBB):
        for seq in range(3):
            pl = bytes([ssrc & 0xFF, seq]) * 5
            payloads[(ssrc, seq)] = pl
            pkt = RtpPacket(payload_type=96, seqnum=seq,
                            timestamp=seq * 160, ssrc=ssrc, payload=pl)
            h.push(Buffer(pkt.to_bytes()))
    outs = [RtpPacket.parse(b.to_bytes()) for b in h.pull_all()]
    assert len(outs) == 6
    for p in outs:
        assert p.payload == payloads[(p.ssrc, p.seqnum)]
    h.teardown()


def test_rtprecv_survives_malformed_rtcp():
    from gstpu.core.harness import Harness
    from gstpu.net.rtp.packet import RtpPacket

    recv = make("rtprecv", latency=0)
    h = Harness(recv, sink_pad="rtp_sink", src_pad="rtp_src")
    rtcp = recv.static_pad("rtcp_sink")
    from gstpu.core.caps import Caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    feeder = Pad("f", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(rtcp)
    # truncated SR claiming a huge length
    assert feeder.push(Buffer(b"\x80\xc8\x00\xff" + b"\x00" * 8)).is_ok
    h.set_caps("application/x-rtp")
    pkt = RtpPacket(payload_type=96, seqnum=0, timestamp=0, ssrc=1,
                    payload=b"x")
    assert h.push(Buffer(pkt.to_bytes())).is_ok  # dataflow survives
    h.teardown()


def test_cea608_repeated_text_pairs_not_dropped():
    from gstpu.codecs.cea608 import Cea608Decoder, Cea608Encoder
    enc, dec = Cea608Encoder(), Cea608Decoder()
    out = None
    for pair in enc.encode_popon("llll"):
        r = dec.push_pair(pair)
        if r is not None:
            out = r
    assert out == "llll"


def test_jitterbuffer_lost_seqnums_wrap():
    from gstpu.net.rtp.jitterbuffer import JitterBuffer, PollOutcome
    jb = JitterBuffer(latency=0)
    jb.queue_packet(65533, 0)
    assert jb.poll(1).outcome is PollOutcome.FORWARD
    jb.queue_packet(2, 10)
    r = jb.poll(20)
    assert r.outcome is PollOutcome.FORWARD
    assert r.lost_seqnums == (65534, 65535, 0, 1)


def test_corrupt_flac_raises_instead_of_stalling():
    from gstpu.codecs.flac import FlacStreamDecoder, encode_verbatim
    stream = bytearray(encode_verbatim(
        np.zeros((5000, 1), np.int16), 8000, 16))
    # corrupt a byte inside the first frame header region
    hdr_end = stream.index(b"\xff\xf8")
    stream[hdr_end + 3] ^= 0xFF
    dec = FlacStreamDecoder()
    dec.push(bytes(stream))
    with pytest.raises(ValueError, match="corrupt"):
        dec.poll()


def test_queue_leaky_enforcement():
    from gstpu.core.harness import Harness
    q = make("queue", max_size_buffers=3)  # default leaky=downstream
    h = Harness(q)
    h.set_caps("x/y")
    for i in range(10):
        h.push(Buffer(bytes([i])))
    assert q._n_buffers == 3   # capped (events don't count)
    assert q.dropped == 7
    h.teardown()


def test_rtpsend_ssrc_collision_drops():
    from gstpu.core.harness import Harness
    from gstpu.core.element import MessageType
    from gstpu.net.rtp.packet import RtpPacket

    send = make("rtpsend")
    h = Harness(send, sink_pad="rtp_sink", src_pad="rtp_src")
    h.set_caps("application/x-rtp")
    # make SSRC 7 a known remote source, then try to send with it
    send.session.handle_recv(
        RtpPacket(payload_type=96, seqnum=0, timestamp=0, ssrc=7,
                  payload=b"r"), 0)
    pkt = RtpPacket(payload_type=96, seqnum=1, timestamp=10, ssrc=7,
                    payload=b"x")
    assert h.push(Buffer(pkt.to_bytes())).is_ok
    assert not h.buffers  # colliding packet not forwarded
    msgs = [m for m in h.bus.drain() if m.type is MessageType.ELEMENT]
    assert msgs and msgs[0].name == "rtpsend-ssrc-collision"
    h.teardown()


def test_basepay_random_ssrcs_differ():
    from gstpu.core.element import State
    ssrcs = set()
    for _ in range(8):
        el = make("rtpopuspay2")
        el.set_state(State.READY)
        ssrcs.add(el._ssrc)
        el.set_state(State.NULL)
    assert len(ssrcs) >= 7  # SystemRandom: collisions ~impossible
