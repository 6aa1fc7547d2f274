"""VP8/VP9 payloader loopbacks + agingradio tests."""

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.buffer import BufferFlags
from gstpu.core.audio import AudioInfo
from gstpu.core.harness import Harness
from gstpu.core.registry import make
from gstpu.net.rtp.packet import RtpPacket


@pytest.mark.parametrize("codec", ["vp8", "vp9"])
def test_vpx_pay_depay_loopback(codec):
    p = parse_launch(f"appsrc name=src ! video/x-{codec} ! "
                     f"rtp{codec}pay2 mtu=200 ! rtp{codec}depay2 ! "
                     f"appsink name=sink")
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    from gstpu.core.caps import parse_caps
    src.set_property("caps", parse_caps(f"video/x-{codec}"))
    p.set_state(State.PLAYING)
    rng = np.random.default_rng(5)
    frames = [bytes([0x00]) + rng.bytes(500 + 100 * i) for i in range(4)]
    for i, f in enumerate(frames):
        src.push_buffer(Buffer(f, pts=i * 33_000_000))
    src.end_of_stream()
    p.run()
    out = sink.pull_all()
    assert [b.to_bytes() for b in out] == frames  # fragmented + rebuilt
    assert out[1].pts - out[0].pts == 33_000_000 * 90000 // 90000
    p.set_state(State.NULL)


def test_vp8_fragments_over_mtu():
    h = Harness(make("rtpvp8pay2", mtu=100))
    h.set_caps("video/x-vp8")
    h.push(Buffer(bytes(500), pts=0))
    pkts = [RtpPacket.parse(b.to_bytes()) for b in h.pull_all()]
    assert len(pkts) > 4
    assert pkts[0].payload[0] & 0x10        # S bit on first
    assert not (pkts[1].payload[0] & 0x10)  # not on rest
    assert pkts[-1].marker and not pkts[0].marker
    h.teardown()


def test_agingradio_degrades_signal():
    p = parse_launch(
        "audiotestsrc freq=440 num-buffers=20 samplesperbuffer=480 "
        "! audio/x-raw, format=F32LE, rate=48000, channels=1 "
        "! rsagingradio ! appsink name=sink")
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    p.run()
    info = AudioInfo.from_caps(sink.caps)
    out = np.concatenate([info.view(b) for b in sink.pull_all()])[:, 0]
    assert out.shape[0] == 20 * 480
    # quantization to 4 bits: few distinct levels
    assert len(np.unique(np.round(out * 16))) < 40
    # signal still present (not silence)
    assert np.abs(out).max() > 0.1
    p.set_state(State.NULL)


def test_agingradio_lowpass_attenuates_high_freq():
    def band_power(freq):
        p = parse_launch(
            f"audiotestsrc freq={freq} num-buffers=20 "
            "samplesperbuffer=480 ! audio/x-raw, format=F64LE, "
            "rate=48000, channels=1 ! rsagingradio white-noise-ampl=0 "
            "clicks-prob=0 bits-to-quantize=32 cubic-curve-passes=0 "
            "! appsink name=sink")
        sink = p.get_by_name("sink")
        p.set_state(State.PLAYING)
        p.run()
        info = AudioInfo.from_caps(sink.caps)
        x = np.concatenate([info.view(b)
                            for b in sink.pull_all()])[4800:, 0]
        p.set_state(State.NULL)
        return float(np.sqrt(np.mean(x ** 2)))

    low = band_power(500)     # below 2 kHz cutoff
    high = band_power(12000)  # far above
    assert high < low * 0.2


def test_ac4parse_framing():
    h = Harness("ac4parse")
    h.set_caps("audio/x-ac4")
    # two frames with garbage prefix: sync 0xAC40, 16-bit size
    f1 = b"\xacG" + b"\xac\x40" + (10).to_bytes(2, "big") + bytes(10)
    f2 = b"\xac\x41" + (6).to_bytes(2, "big") + bytes(6) + b"\x00\x00"
    h.push(Buffer(f1[:7]))
    h.push(Buffer(f1[7:] + f2))
    outs = h.pull_all()
    assert len(outs) == 2
    assert outs[0].size == 14   # hdr 4 + payload 10
    assert outs[1].size == 12   # hdr 4 + payload 6 + crc 2
    from gstpu.core.caps import Caps
    assert h.output_caps()[0]["framed"] is True
    h.teardown()


def test_s302mparse_caps():
    h = Harness("s302mparse")
    h.set_caps("audio/x-smpte-302m")
    # header: size=8, channels code 1 (4ch), id 0, bits code 1 (20)
    header = (8 << 16) | (1 << 14) | (1 << 4)
    h.push(Buffer(header.to_bytes(4, "big") + bytes(8), pts=0))
    out = h.pull()
    caps = h.output_caps()[0]
    assert caps["channels"] == 4
    assert caps["depth"] == 20
    assert caps["parsed"] is True
    h.teardown()
