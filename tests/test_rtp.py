"""RTP stack tests: packet codecs, sans-IO session/jitterbuffer state
machines with injected times (the reference's multi-node test strategy,
SURVEY.md §4.4), pay!depay loopbacks, socket elements."""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.net.rtp.jitterbuffer import (JitterBuffer, PollOutcome,
                                        QueueResult)
from gstpu.net.rtp.packet import (Bye, ReceiverReport, RtpPacket, Sdes,
                                  SenderReport, ntp_from_ns, ns_from_ntp,
                                  parse_rtcp)
from gstpu.net.rtp.session import (RecvReply, SendReply, Session)

SECOND = 1_000_000_000


# -- packet codecs ------------------------------------------------------

def test_rtp_roundtrip_basic():
    p = RtpPacket(payload_type=96, seqnum=1234, timestamp=567890,
                  ssrc=0xDEADBEEF, payload=b"hello", marker=True)
    q = RtpPacket.parse(p.to_bytes())
    assert q == p


def test_rtp_roundtrip_fancy():
    p = RtpPacket(payload_type=127, seqnum=65535, timestamp=2**32 - 1,
                  ssrc=1, payload=b"x" * 100, csrcs=(7, 8, 9),
                  extension=(0xBEDE, b"\x10\x22\x00\x00"))
    q = RtpPacket.parse(p.to_bytes())
    assert q.csrcs == (7, 8, 9)
    assert q.extension == (0xBEDE, b"\x10\x22\x00\x00")
    assert q.payload == p.payload


def test_rtp_parse_errors():
    with pytest.raises(ValueError):
        RtpPacket.parse(b"\x00" * 12)  # bad version
    with pytest.raises(ValueError):
        RtpPacket.parse(b"\x80\x60")   # short


def test_rtcp_compound_roundtrip():
    sr = SenderReport(ssrc=42, ntp_timestamp=ntp_from_ns(1_700_000_000
                                                         * SECOND),
                      rtp_timestamp=8000, packet_count=10, octet_count=999)
    sdes = Sdes([(42, [(Sdes.CNAME, b"a@b")])])
    bye = Bye([42], b"done")
    data = sr.to_bytes() + sdes.to_bytes() + bye.to_bytes()
    pkts = parse_rtcp(data)
    assert isinstance(pkts[0], SenderReport)
    assert pkts[0].packet_count == 10
    assert isinstance(pkts[1], Sdes)
    assert pkts[1].chunks[0][1][0] == (Sdes.CNAME, b"a@b")
    assert isinstance(pkts[2], Bye)
    assert pkts[2].ssrcs == [42] and pkts[2].reason == b"done"


def test_ntp_conversion_roundtrip():
    t = 1_700_000_123_456_789_000
    assert abs(ns_from_ntp(ntp_from_ns(t)) - t) < 2


# -- session (sans-IO, injected time) ------------------------------------

def _pkt(seq, ts=0, ssrc=0x1111, pt=96, payload=b"p"):
    return RtpPacket(payload_type=pt, seqnum=seq, timestamp=ts, ssrc=ssrc,
                     payload=payload)


def test_session_send_recv_flow():
    s = Session()
    assert s.handle_send(_pkt(0), 0) is SendReply.NEW_SSRC
    assert s.handle_send(_pkt(0), 0) is SendReply.PASSTHROUGH
    assert s.handle_recv(_pkt(10, ssrc=0x2222), 0) is RecvReply.NEW_SSRC
    assert s.handle_recv(_pkt(11, ssrc=0x2222), 0) is RecvReply.PASSTHROUGH
    # sending with an SSRC we receive = collision
    assert s.handle_send(_pkt(5, ssrc=0x2222), 0) \
        is SendReply.SSRC_COLLISION


def test_session_rtcp_sr_generation():
    s = Session()
    s.set_pt_clock_rate(96, 48000)
    s.handle_send(_pkt(0, ts=0), 0)
    for i in range(10):
        s.handle_send(_pkt(i, ts=i * 480), i * 10_000_000)
    assert s.poll_rtcp_send(SECOND) is None  # < 5s: not due
    data = s.poll_rtcp_send(6 * SECOND, unix_now=1_700_000_000 * SECOND)
    assert data is not None
    pkts = parse_rtcp(data)
    assert isinstance(pkts[0], SenderReport)
    assert pkts[0].packet_count == 10
    assert isinstance(pkts[1], Sdes)
    # next report is rescheduled
    assert s.poll_rtcp_send(6 * SECOND + 1) is None


def test_session_rr_loss_reporting():
    s = Session()
    s.set_pt_clock_rate(96, 8000)
    now = 0
    # receive seq 0..9 with 5..7 missing
    for seq in [0, 1, 2, 3, 4, 8, 9]:
        s.handle_recv(_pkt(seq, ts=seq * 160, ssrc=0x3333), now)
        now += 20_000_000
    data = s.poll_rtcp_send(10 * SECOND)
    pkts = parse_rtcp(data)
    rr = pkts[0]
    assert isinstance(rr, ReceiverReport)
    blk = rr.reports[0]
    assert blk.ssrc == 0x3333
    assert blk.cumulative_lost == 3
    assert blk.ext_highest_seq == 9


def test_session_bye_and_timeout():
    s = Session()
    s.handle_recv(_pkt(0, ssrc=7), 0)
    evs = s.handle_rtcp_recv(Bye([7], b"bye").to_bytes(), SECOND)
    assert ("bye", 7) in evs
    s2 = Session()
    s2.handle_recv(_pkt(0, ssrc=9), 0)
    assert s2.timed_out_sources(100 * SECOND) == [9]
    assert 9 not in s2.remote_sources


def test_session_sr_sync_mapping():
    s = Session()
    sr = SenderReport(ssrc=5, ntp_timestamp=ntp_from_ns(1000 * SECOND),
                      rtp_timestamp=90000, packet_count=1, octet_count=10)
    s.handle_rtcp_recv(sr.to_bytes(), 0)
    ntp_ns, rtp = s.ntp_rtp_mapping(5)
    assert rtp == 90000
    assert abs(ntp_ns - 1000 * SECOND) < 2


# -- jitterbuffer --------------------------------------------------------

def test_jitterbuffer_reorders():
    jb = JitterBuffer(latency=100)
    ids = {}
    for seq in (0, 2, 1):
        res, pid = jb.queue_packet(seq, now=0)
        assert res is QueueResult.QUEUED
        ids[seq] = pid
    order = []
    now = 200
    while True:
        r = jb.poll(now)
        if r.outcome is not PollOutcome.FORWARD:
            break
        order.append(r.id)
    assert order == [ids[0], ids[1], ids[2]]


def test_jitterbuffer_duplicate_late():
    jb = JitterBuffer(latency=100)
    jb.queue_packet(0, 0)
    res, _ = jb.queue_packet(0, 0)
    assert res is QueueResult.DUPLICATE
    r = jb.poll(200)
    assert r.outcome is PollOutcome.FORWARD
    res, _ = jb.queue_packet(0, 300)  # already forwarded -> late
    assert res is QueueResult.LATE


def test_jitterbuffer_timeout_then_contiguous_flow():
    jb = JitterBuffer(latency=100)
    _, p0 = jb.queue_packet(0, now=0)
    r = jb.poll(50)
    assert r.outcome is PollOutcome.TIMEOUT and r.time == 100
    assert jb.poll(100).id == p0
    # contiguous follow-up flows without waiting out the full deadline
    _, p1 = jb.queue_packet(1, now=110)
    assert jb.poll(111).id == p1


def test_jitterbuffer_loss_reported():
    jb = JitterBuffer(latency=10)
    jb.queue_packet(0, 0)
    assert jb.poll(20).outcome is PollOutcome.FORWARD
    jb.queue_packet(3, 30)  # 1, 2 missing
    r = jb.poll(50)
    assert r.outcome is PollOutcome.FORWARD
    assert r.lost_seqnums == (1, 2)


def test_jitterbuffer_seqnum_wraparound():
    jb = JitterBuffer(latency=10)
    ids = []
    for seq in (65534, 65535, 0, 1):
        res, pid = jb.queue_packet(seq, 0)
        assert res is QueueResult.QUEUED
        ids.append(pid)
    out = []
    while True:
        r = jb.poll(100)
        if r.outcome is not PollOutcome.FORWARD:
            break
        out.append(r.id)
    assert out == ids


# -- pay/depay loopbacks --------------------------------------------------

def test_l16_pay_depay_loopback():
    p = parse_launch(
        "audiotestsrc num-buffers=10 samplesperbuffer=160 "
        "! audio/x-raw, format=S16BE, rate=8000, channels=1 "
        "! rtpL16pay2 ! rtpL16depay2 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert sum(b.size for b in bufs) == 10 * 160 * 2
    s = sink.caps[0]
    assert s.name == "audio/x-raw" and s["format"] == "S16BE"
    assert s["rate"] == 8000
    p.set_state(State.NULL)


def test_opus_pay_depay_pts():
    h = Harness("rtpopuspay2")
    h.set_caps("audio/x-opus, rate=48000, channels=2")
    for i in range(3):
        h.push(Buffer(bytes([i] * 50), pts=i * 20_000_000))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in h.pull_all()]
    assert [p.seqnum for p in pkts] == \
        [(pkts[0].seqnum + i) & 0xFFFF for i in range(3)]
    # rtp timestamps advance by 20ms * 48kHz = 960
    assert (pkts[1].timestamp - pkts[0].timestamp) & 0xFFFFFFFF == 960
    h.teardown()


def test_rtpsend_rtprecv_loop():
    p = parse_launch(
        "audiotestsrc num-buffers=20 samplesperbuffer=160 "
        "! audio/x-raw, format=S16BE, rate=8000, channels=1 "
        "! rtpL16pay2 ! rtpsend name=send ! rtprecv name=recv latency=0 "
        "! rtpL16depay2 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert sum(b.size for b in bufs) == 20 * 160 * 2
    recv = p.get_by_name("recv")
    assert len(recv.session.remote_sources) == 1
    p.set_state(State.NULL)


def test_udp_roundtrip_localhost():
    recv = parse_launch("udpsrc name=src port=0 ! appsink name=sink")
    src = recv.get_by_name("src")
    sink = recv.get_by_name("sink")
    recv.set_state(State.PLAYING)
    port = src.bound_port
    assert port > 0

    send = parse_launch(f"audiotestsrc num-buffers=5 samplesperbuffer=100 "
                        f"! audio/x-raw, format=S16LE, rate=8000, "
                        f"channels=1 ! udpsink host=127.0.0.1 port={port}")
    send.set_state(State.PLAYING)
    send.run()
    import time
    deadline = time.monotonic() + 5
    while len(sink.samples) < 5 and time.monotonic() < deadline:
        recv.iterate()
        time.sleep(0.001)
    assert len(sink.samples) == 5
    from gstpu.core.buffer import NetAddressMeta
    meta = sink.samples[0].get_meta(NetAddressMeta)
    assert meta is not None and meta.addr[0] == "127.0.0.1"
    send.set_state(State.NULL)
    recv.set_state(State.NULL)


def test_onvif_metadata_pay_depay():
    from gstpu.elements.net.onvif import OnvifXMLFrameMeta
    xml = (b"<?xml version='1.0'?><tt:MetadataStream "
           b"xmlns:tt='http://www.onvif.org/ver10/schema'>"
           + b"<tt:Event>" + b"x" * 3000 + b"</tt:Event>"
           b"</tt:MetadataStream>")
    p = parse_launch("appsrc name=src "
                     "! application/x-onvif-metadata, encoding=utf8 "
                     "! onvifmetadatapay mtu=500 ! onvifmetadatadepay "
                     "! appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    from gstpu.core.caps import parse_caps
    src.set_property("caps", parse_caps(
        "application/x-onvif-metadata, encoding=utf8"))
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(xml, pts=0))
    src.end_of_stream()
    p.run()
    out = sink.pull_all()
    assert len(out) == 1
    assert out[0].to_bytes() == xml  # fragmented over MTU + reassembled
    assert out[0].get_meta(OnvifXMLFrameMeta) is not None
    p.set_state(State.NULL)


def test_rtp_mp2t_roundtrip():
    from gstpu.codecs.mpegts import build_ts_packet
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make

    ts = b"".join(build_ts_packet(0x100, payload=bytes([i]) * 184,
                                  pusi=True, cc=i) for i in range(9))
    pay = Harness(make("rtpmp2tpay2", mtu=1400, ssrc=7,
                       seqnum_offset=0, timestamp_offset=0))
    pay.set_caps("video/mpegts, packetsize=188, systemstream=true")
    pay.push(Buffer(ts, pts=0))
    pay.push_eos()                        # drain the remainder
    pkts = pay.pull_all()
    # 1400-12 = 1388 -> 7 TS packets per RTP packet: 7 + 2
    assert len(pkts) == 2
    from gstpu.net.rtp.packet import RtpPacket
    p0 = RtpPacket.parse(pkts[0].to_bytes())
    assert p0.payload_type == 33
    assert len(p0.payload) == 7 * 188
    assert p0.payload[0] == 0x47
    pay.teardown()

    depay = Harness(make("rtpmp2tdepay2"))
    depay.set_caps("application/x-rtp, media=video, encoding-name=MP2T,"
                   " clock-rate=90000, payload=33")
    for p in pkts:
        depay.push(p)
    out = b"".join(b.to_bytes() for b in depay.pull_all())
    assert out == ts
    assert depay.element.srcpad.caps()[0]["packetsize"] == 188
    depay.teardown()


def test_rtp_mp2t_depay_resync():
    from gstpu.codecs.mpegts import build_ts_packet
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    good = build_ts_packet(0x30, payload=b"x" * 184, pusi=True)
    pkt = RtpPacket(payload_type=33, seqnum=1, timestamp=0, ssrc=1,
                    payload=b"\x00\x00\x00" + good)
    depay = Harness(make("rtpmp2tdepay2"))
    depay.set_caps("application/x-rtp, media=video, encoding-name=MP2T,"
                   " clock-rate=90000, payload=33")
    depay.push(Buffer(pkt.to_bytes()))
    outs = depay.pull_all()
    assert len(outs) == 1 and outs[0].to_bytes() == good
    depay.teardown()


def test_rtp_ac3_whole_and_fragmented():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    pay = Harness(make("rtpac3pay2", mtu=100, ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("audio/x-ac3, framed=true, rate=48000")
    small = b"\x0b\x77" + bytes(30)
    big = b"\x0b\x77" + bytes(300)
    pay.push(Buffer(small, pts=0))
    pay.push(Buffer(big, pts=10**6))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in pay.pull_all()]
    assert pkts[0].payload[:2] == bytes([0, 1])    # FT=0 NF=1
    assert pkts[0].payload[2:] == small and pkts[0].marker
    frags = pkts[1:]
    assert frags[0].payload[0] == 1                # initial fragment
    assert all(p.payload[0] == 3 for p in frags[1:])
    assert all(p.payload[1] == len(frags) for p in frags)
    assert frags[-1].marker
    pay.teardown()

    depay = Harness(make("rtpac3depay2"))
    depay.set_caps("application/x-rtp, media=audio, encoding-name=AC3,"
                   " clock-rate=48000")
    for p in pkts:
        depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert [o.to_bytes() for o in outs] == [small, big]
    assert depay.element.srcpad.caps()[0]["rate"] == 48000
    depay.teardown()


def test_rtp_mpa_roundtrip():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    pay = Harness(make("rtpmpapay2", mtu=60, ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("audio/mpeg, mpegversion=1")
    frame = bytes(range(100))
    pay.push(Buffer(frame, pts=0))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in pay.pull_all()]
    assert all(p.payload_type == 14 for p in pkts)
    assert len(pkts) == 3                           # 44-byte chunks
    assert pkts[1].payload[2:4] == (44).to_bytes(2, "big")
    depay = Harness(make("rtpmpadepay2"))
    depay.set_caps("application/x-rtp, media=audio, encoding-name=MPA,"
                   " clock-rate=90000, payload=14")
    for p in pkts:
        depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert len(outs) == 1 and outs[0].to_bytes() == frame
    pay.teardown()
    depay.teardown()


def test_rtp_mp4g_aac_hbr_roundtrip():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    pay = Harness(make("rtpmp4gpay2", mtu=100, ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("audio/mpeg, mpegversion=4, stream-format=raw, "
                 "rate=44100")
    small = bytes(range(50))
    big = bytes(200)
    pay.push(Buffer(small, pts=0))
    pay.push(Buffer(big, pts=10**6))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in pay.pull_all()]
    # AU-headers-length = 16 bits, AU header = size<<3
    assert pkts[0].payload[:2] == (16).to_bytes(2, "big")
    assert pkts[0].payload[2] << 8 | pkts[0].payload[3] == 50 << 3
    assert pkts[0].marker
    assert not pkts[1].marker and pkts[-1].marker  # big fragmented
    pay.teardown()

    depay = Harness(make("rtpmp4gdepay2"))
    depay.set_caps("application/x-rtp, media=audio, "
                   "encoding-name=MPEG4-GENERIC, mode=AAC-hbr, "
                   "clock-rate=44100, sizelength=13, indexlength=3, "
                   "indexdeltalength=3, payload=96")
    for p in pkts:
        depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert [o.to_bytes() for o in outs] == [small, big]
    s = depay.element.srcpad.caps()[0]
    assert s["mpegversion"] == 4 and s["rate"] == 44100
    depay.teardown()


def test_onvif_metadata_parse_retime_and_group():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.elements.net.onvif import iterate_video_analytics_frames

    NS = "http://www.onvif.org/ver10/schema"

    def doc(*utcs):
        frames = "".join(
            f'<tt:Frame UtcTime="{u}"><tt:Object ObjectId="1"/>'
            f"</tt:Frame>" for u in utcs)
        return (f'<tt:MetadataStream xmlns:tt="{NS}">'
                f"<tt:VideoAnalytics>{frames}</tt:VideoAnalytics>"
                f"</tt:MetadataStream>").encode()

    h = Harness(make("onvifmetadataparse", max_lateness=0))
    h.set_caps("application/x-onvif-metadata, encoding=utf8")
    # two ticks arrive out of order in one buffer, one in the next
    h.push(Buffer(doc("2026-01-01T00:00:01.000Z",
                      "2026-01-01T00:00:00.000Z"), pts=10**9))
    h.push(Buffer(doc("2026-01-01T00:00:02.000Z"), pts=3 * 10**9))
    h.push_eos()
    outs = h.pull_all()
    assert len(outs) == 3
    # mapping pinned at (utc of first frame seen, pts=1s): tick 0 maps
    # 1s earlier -> clamped ordering preserved
    assert [o.pts for o in outs] == sorted(o.pts for o in outs)
    assert outs[1].pts - outs[0].pts == 10**9
    parsed = list(iterate_video_analytics_frames(outs[0].to_bytes()))
    assert len(parsed) == 1
    h.teardown()


def test_onvif_metadata_parse_bad_xml_errors():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu import FlowReturn
    h = Harness(make("onvifmetadataparse"))
    h.set_caps("application/x-onvif-metadata, encoding=utf8")
    assert h.push(Buffer(b"<not-xml")) is FlowReturn.ERROR
    h.teardown()


def test_rtp_jpeg_roundtrip_decodes_pixel_exact():
    import io

    import numpy as np
    from PIL import Image

    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (48, 64, 3),
                                       dtype=np.uint8), "RGB")
    b = io.BytesIO()
    img.save(b, "JPEG", quality=75)
    jpeg = b.getvalue()

    pay = Harness(make("rtpjpegpay2", mtu=400, ssrc=1,
                       seqnum_offset=0, timestamp_offset=0))
    pay.set_caps("image/jpeg")
    pay.push(Buffer(jpeg, pts=0))
    pkts = [RtpPacket.parse(x.to_bytes()) for x in pay.pull_all()]
    assert len(pkts) > 1                    # fragmented
    assert pkts[0].payload_type == 26
    assert pkts[0].payload[5] == 255        # Q=255: inline qtables
    assert pkts[0].payload[6] == 64 // 8
    assert pkts[-1].marker
    pay.teardown()

    depay = Harness(make("rtpjpegdepay2"))
    depay.set_caps("application/x-rtp, media=video, "
                   "encoding-name=JPEG, clock-rate=90000, payload=26")
    for p in pkts:
        depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert len(outs) == 1
    orig = np.asarray(Image.open(io.BytesIO(jpeg)))
    back = np.asarray(Image.open(io.BytesIO(outs[0].to_bytes())))
    assert (orig == back).all()
    depay.teardown()


def test_rtp_jpeg_depay_midstream_join():
    """Joining after offset 0 must wait for the next frame start."""
    import io

    import numpy as np
    from PIL import Image

    from gstpu.core.harness import Harness
    from gstpu.core.registry import make

    rng = np.random.default_rng(4)
    img = Image.fromarray(rng.integers(0, 256, (16, 16, 3),
                                       dtype=np.uint8), "RGB")
    b = io.BytesIO()
    img.save(b, "JPEG")
    pay = Harness(make("rtpjpegpay2", mtu=200, ssrc=1,
                       seqnum_offset=0, timestamp_offset=0))
    pay.set_caps("image/jpeg")
    pay.push(Buffer(b.getvalue(), pts=0))
    pay.push(Buffer(b.getvalue(), pts=10**9 // 30))
    pkts = pay.pull_all()
    n_per_frame = len(pkts) // 2
    depay = Harness(make("rtpjpegdepay2"))
    depay.set_caps("application/x-rtp, media=video, "
                   "encoding-name=JPEG, clock-rate=90000, payload=26")
    for p in pkts[1:]:                      # drop the first fragment
        depay.push(p)
    outs = depay.pull_all()
    assert len(outs) == 1                   # only the second frame
    Image.open(io.BytesIO(outs[0].to_bytes())).load()
    depay.teardown()


def _av1_obu(otype, body):
    from gstpu.elements.net.rtp_video import leb128_encode
    return bytes([otype << 3 | 0x02]) + leb128_encode(len(body)) + body


def test_rtp_av1_roundtrip():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    # temporal unit: TD + seq header + frame (big, forces fragmenting)
    tu = (_av1_obu(2, b"") + _av1_obu(1, bytes(range(20)))
          + _av1_obu(6, bytes(600)))
    pay = Harness(make("rtpav1pay2", mtu=200, ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("video/x-av1, stream-format=obu-stream")
    pay.push(Buffer(tu, pts=0))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in pay.pull_all()]
    assert len(pkts) > 1
    # first packet: N=1 (starts with a sequence header), Z=0
    assert pkts[0].payload[0] & 0x08
    assert not pkts[0].payload[0] & 0x80
    # continuation packets carry Z=1
    assert pkts[1].payload[0] & 0x80
    assert pkts[-1].marker
    pay.teardown()

    depay = Harness(make("rtpav1depay2"))
    depay.set_caps("application/x-rtp, media=video, encoding-name=AV1,"
                   " clock-rate=90000, payload=96")
    for p in pkts:
        depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert len(outs) == 1
    from gstpu.elements.net.rtp_video import parse_obus
    got = list(parse_obus(outs[0].to_bytes()))
    # TD regenerated + seq header + frame, bodies identical
    assert [t for t, _ in got] == [2, 1, 6]
    assert got[1][1][1:] == bytes(range(20))
    assert got[2][1][1:] == bytes(600)


def test_rtp_av1_small_tu_single_packet():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket
    from gstpu.elements.net.rtp_video import parse_obus

    tu = _av1_obu(6, b"tiny-frame")
    pay = Harness(make("rtpav1pay2", ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("video/x-av1, stream-format=obu-stream")
    pay.push(Buffer(tu, pts=0))
    pkts = pay.pull_all()
    assert len(pkts) == 1
    p = RtpPacket.parse(pkts[0].to_bytes())
    assert p.payload[0] >> 4 & 3 == 1       # W=1, unprefixed element
    assert not p.payload[0] & 0x08          # no seq header: N=0
    pay.teardown()
    depay = Harness(make("rtpav1depay2"))
    depay.set_caps("application/x-rtp, media=video, encoding-name=AV1,"
                   " clock-rate=90000, payload=96")
    depay.push(pkts[0])
    out = depay.pull_all()[0].to_bytes()
    types = [t for t, _ in parse_obus(out)]
    assert types == [2, 6]
    depay.teardown()


@pytest.mark.parametrize("wb", [False, True])
def test_rtp_amr_octet_aligned_roundtrip(wb):
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket
    from gstpu.elements.net.rtp_elements import (_AMR_NB_SIZES,
                                                 _AMR_WB_SIZES)

    sizes = _AMR_WB_SIZES if wb else _AMR_NB_SIZES
    sfx = "wb" if wb else ""
    media = "audio/AMR-WB" if wb else "audio/AMR"
    rate = 16000 if wb else 8000
    # two frames (FT 0 and FT 7) in file-storage framing, Q=1
    fr = b""
    for ft in (0, 7):
        fr += bytes([ft << 3 | 0x04]) + bytes(range(sizes[ft]))

    pay = Harness(make(f"rtpamr{sfx}pay2", ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps(media)
    pay.push(Buffer(fr, pts=0))
    pkts = pay.pull_all()
    assert len(pkts) == 1
    p = RtpPacket.parse(pkts[0].to_bytes())
    assert p.payload[0] == 0xF0                 # CMR: no request
    assert p.payload[1] & 0x80                  # first TOC has F=1
    assert not p.payload[2] & 0x80              # last TOC F=0
    pay.teardown()

    depay = Harness(make(f"rtpamr{sfx}depay2"))
    depay.set_caps(f"application/x-rtp, media=audio, encoding-name="
                   f"{'AMR-WB' if wb else 'AMR'}, clock-rate={rate}, "
                   f"octet-align=(string)1, payload=96")
    depay.push(pkts[0])
    out = depay.pull_all()
    assert len(out) == 1 and out[0].to_bytes() == fr
    depay.teardown()


def test_rtp_mpv_roundtrip():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    frame = b"\x00\x00\x01\xb3" + bytes(500)   # sequence header-ish
    pay = Harness(make("rtpmpvpay2", mtu=200, ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("video/mpeg, mpegversion=2, systemstream=false")
    pay.push(Buffer(frame, pts=0))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in pay.pull_all()]
    assert len(pkts) == 3 and all(p.payload_type == 32 for p in pkts)
    assert pkts[0].payload[2] & 0x10            # B on first
    assert pkts[-1].payload[2] & 0x08 and pkts[-1].marker
    pay.teardown()

    depay = Harness(make("rtpmpvdepay2"))
    depay.set_caps("application/x-rtp, media=video, encoding-name=MPV,"
                   " clock-rate=90000, payload=32")
    for p in pkts:
        depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert len(outs) == 1 and outs[0].to_bytes() == frame
    depay.teardown()


def test_rtp_vraw_roundtrip():
    import numpy as np
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.core.video import VideoInfo
    from gstpu.net.rtp.packet import RtpPacket

    vi = VideoInfo("RGB", 64, 16)
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 256, (16, 64, 3), dtype=np.uint8)
    pay = Harness(make("rtpvrawpay2", mtu=400, ssrc=1,
                       seqnum_offset=0, timestamp_offset=0))
    pay.set_caps("video/x-raw, format=RGB, width=64, height=16, "
                 "framerate=30/1")
    pay.push(vi.make_buffer(frame, pts=0))
    pkts = pay.pull_all()
    assert len(pkts) > 1
    p0 = RtpPacket.parse(pkts[0].to_bytes())
    assert int.from_bytes(p0.payload[2:4], "big") > 0   # line length
    assert RtpPacket.parse(pkts[-1].to_bytes()).marker
    pay.teardown()

    depay = Harness(make("rtpvrawdepay2"))
    depay.set_caps("application/x-rtp, media=video, encoding-name=RAW,"
                   " clock-rate=90000, payload=96, sampling=RGB, "
                   "width=(string)64, height=(string)16, "
                   "depth=(string)8")
    for p in pkts:
        depay.push(p)
    outs = depay.pull_all()
    assert len(outs) == 1
    back = VideoInfo.from_caps(depay.element.srcpad.caps()).view(
        outs[0])
    assert (back == frame).all()
    depay.teardown()


def test_rtp_mp4a_latm_roundtrip():
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.net.rtp.packet import RtpPacket

    pay = Harness(make("rtpmp4apay2", mtu=120, ssrc=1, seqnum_offset=0,
                       timestamp_offset=0))
    pay.set_caps("audio/mpeg, mpegversion=4, stream-format=raw, "
                 "rate=44100, codec_data=(string)1210")
    small = bytes(range(60))
    big = bytes(300)                       # 0xFF-run length prefix
    pay.push(Buffer(small, pts=0))
    pay.push(Buffer(big, pts=10**6))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in pay.pull_all()]
    assert pkts[0].payload[0] == 60        # single length byte
    assert pkts[1].payload[0] == 0xFF      # 255 + 45
    assert pkts[1].payload[1] == 45
    pay.teardown()

    depay = Harness(make("rtpmp4adepay2"))
    depay.set_caps("application/x-rtp, media=audio, "
                   "encoding-name=MP4A-LATM, clock-rate=44100, "
                   "config=(string)1210, payload=96")
    for p in pkts:
        depay.push(Buffer(p.to_bytes()))
    outs = depay.pull_all()
    assert [o.to_bytes() for o in outs] == [small, big]
    s = depay.element.srcpad.caps()[0]
    assert s["rate"] == 44100 and s["codec_data"] == "1210"
    depay.teardown()


def test_l24_pay_depay_loopback():
    """S24BE (packed 3-byte) linear audio through the L24 pair
    (reference net/rtp/src/linear_audio/pay/mod.rs:59-62 registers
    L8/L16/L24)."""
    p = parse_launch(
        "audiotestsrc num-buffers=10 samplesperbuffer=160 "
        "! audio/x-raw, format=S24BE, rate=8000, channels=2 "
        "! rtpL24pay2 ! rtpL24depay2 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert sum(b.size for b in bufs) == 10 * 160 * 2 * 3  # 3 B/sample
    s = sink.caps[0]
    assert s.name == "audio/x-raw" and s["format"] == "S24BE"
    assert s["rate"] == 8000 and s["channels"] == 2
    p.set_state(State.NULL)


def test_l24_pay_seqnum_and_ts():
    h = Harness("rtpL24pay2")
    h.set_caps("audio/x-raw, format=S24BE, rate=48000, channels=1, "
               "layout=interleaved")
    for i in range(3):
        h.push(Buffer(bytes(400 * 3), pts=i * 10_000_000))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in h.pull_all()]
    assert [p.seqnum for p in pkts] == \
        [(pkts[0].seqnum + i) & 0xFFFF for i in range(3)]
    # one packet per buffer (1200 B fits the MTU); pts 10ms @48k = 480
    assert (pkts[1].timestamp - pkts[0].timestamp) & 0xFFFFFFFF == 480
    assert all(len(p.payload) == 400 * 3 for p in pkts)
    h.teardown()


def test_l24_mtu_fragmentation_frame_aligned():
    """A buffer over the MTU splits on FRAME boundaries and the RTP
    timestamp advances by the frames carried (reference
    linear_audio/pay behavior)."""
    h = Harness("rtpL24pay2")
    h.set_caps("audio/x-raw, format=S24BE, rate=48000, channels=2, "
               "layout=interleaved")
    bpf = 6                      # 3 B * 2 ch
    h.push(Buffer(bytes(480 * bpf), pts=0))    # 2880 B > 1388
    pkts = [RtpPacket.parse(b.to_bytes()) for b in h.pull_all()]
    assert len(pkts) > 1
    frames_per_pkt = (1400 - 12) // bpf
    for p in pkts[:-1]:
        assert len(p.payload) == frames_per_pkt * bpf
        assert not p.marker
    assert pkts[-1].marker
    assert sum(len(p.payload) for p in pkts) == 480 * bpf
    assert (pkts[1].timestamp - pkts[0].timestamp) & 0xFFFFFFFF \
        == frames_per_pkt
    h.teardown()


def test_s24_pack_unpack_roundtrip():
    import numpy as np

    from gstpu.core.audio import pack_s24, unpack_s24
    vals = np.array([0, 1, -1, 0x7FFFFF, -0x800000, 12345, -54321],
                    np.int32)
    for fmt in ("S24BE", "S24LE"):
        packed = pack_s24(vals, fmt)
        assert packed.size == vals.size * 3
        assert np.array_equal(unpack_s24(packed.tobytes(), fmt), vals)
    # explicit wire bytes: 0x123456 big-endian
    assert pack_s24(np.array([0x123456]), "S24BE").tobytes() == \
        b"\x12\x34\x56"
    assert pack_s24(np.array([0x123456]), "S24LE").tobytes() == \
        b"\x56\x34\x12"


def test_audioconvert_s16_to_s24be():
    p = parse_launch(
        "audiotestsrc num-buffers=4 samplesperbuffer=100 "
        "! audio/x-raw, format=S16LE, rate=8000, channels=1 "
        "! audioconvert ! audio/x-raw, format=S24BE, rate=8000, "
        "channels=1 ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    bufs = sink.pull_all()
    assert sum(b.size for b in bufs) == 4 * 100 * 3
    # the S24 samples carry the S16 signal in the top 16 bits
    import numpy as np

    from gstpu.core.audio import AudioInfo
    info = AudioInfo.from_caps(sink.caps)
    x = np.concatenate([info.view(b)[:, 0] for b in bufs])
    assert np.abs(x).max() > 0.5 * (1 << 23)   # full-scale-ish sine
    p.set_state(State.NULL)
