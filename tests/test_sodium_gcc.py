"""sodium encryption + GCC bandwidth estimation tests."""

import os

import numpy as np
import pytest

from gstpu import Buffer, State, parse_launch
from gstpu.core.registry import make
from gstpu.net.rtp.gcc import (GccEstimator, PacketFeedback, RateState,
                               Usage)

SECOND = 10**9
KEY = bytes(range(32))


def test_sodium_roundtrip_pipeline():
    p = parse_launch("appsrc name=src ! sodiumencrypter name=enc ! "
                     "sodiumdecrypter name=dec ! appsink name=sink")
    from gstpu.core.caps import parse_caps
    src = p.get_by_name("src")
    src.set_property("caps", parse_caps("application/x-test"))
    p.get_by_name("enc").set_property("key", KEY)
    p.get_by_name("dec").set_property("key", KEY)
    sink = p.get_by_name("sink")
    p.set_state(State.PLAYING)
    payloads = [os.urandom(100 + i) for i in range(5)]
    for i, pl in enumerate(payloads):
        src.push_buffer(Buffer(pl, pts=i))
    src.end_of_stream()
    p.run()
    out = [b.to_bytes() for b in sink.pull_all()]
    assert out == payloads
    p.set_state(State.NULL)


def test_sodium_ciphertext_differs_and_authenticated():
    enc = make("sodiumencrypter", key=KEY, nonce=bytes(range(24)))
    from gstpu.core.harness import Harness
    h = Harness(enc)
    h.set_caps("application/x-test")
    h.push(Buffer(b"secret data"))
    ct = b"".join(b.to_bytes() for b in h.pull_all())
    assert b"secret data" not in ct
    assert ct.startswith(b"gstpu-sodium-stream")
    h.teardown()

    # tampered ciphertext must fail authentication
    dec = make("sodiumdecrypter", key=KEY)
    h2 = Harness(dec)
    h2.set_caps("application/x-sodium-encrypted-stream")
    bad = bytearray(ct)
    bad[-1] ^= 0xFF
    from gstpu import FlowReturn
    assert h2.push(Buffer(bytes(bad))) is FlowReturn.ERROR
    h2.teardown()


def test_sodium_wrong_key_fails():
    enc = make("sodiumencrypter", key=KEY)
    from gstpu.core.harness import Harness
    h = Harness(enc)
    h.set_caps("application/x-test")
    h.push(Buffer(b"hello"))
    ct = b"".join(b.to_bytes() for b in h.pull_all())
    h.teardown()
    dec = make("sodiumdecrypter", key=bytes(32))
    h2 = Harness(dec)
    h2.set_caps("application/x-sodium-encrypted-stream")
    from gstpu import FlowReturn
    assert h2.push(Buffer(ct)) is FlowReturn.ERROR
    h2.teardown()


def test_sodium_restart_never_reuses_keystream():
    """ADVICE r1: restarting the element (or a new stream under the
    same key) must never encrypt with a repeated (key, nonce) pair —
    the per-stream HKDF subkey guarantees distinct keystreams, so the
    same plaintext yields different chunk ciphertexts."""
    from gstpu.core.harness import Harness
    cts = []
    for _ in range(2):
        enc = make("sodiumencrypter", key=KEY)
        h = Harness(enc)
        h.set_caps("application/x-test")
        h.push(Buffer(b"identical plaintext"))
        data = b"".join(b.to_bytes() for b in h.pull_all())
        h.teardown()
        hdr = len(b"gstpu-sodium-stream\x01") + 24
        cts.append(data[hdr:])
    assert cts[0] != cts[1]


def test_sodium_explicit_header_is_deterministic():
    from gstpu.core.harness import Harness

    def run():
        enc = make("sodiumencrypter", key=KEY, nonce=bytes(24))
        h = Harness(enc)
        h.set_caps("application/x-test")
        h.push(Buffer(b"payload"))
        out = b"".join(b.to_bytes() for b in h.pull_all())
        h.teardown()
        return out

    assert run() == run()


# -- GCC ----------------------------------------------------------------

def _feedback(start_ns, n, interval_ns, size, extra_delay_per_pkt=0,
              base_delay=10**6):
    """Packets sent every interval; receiver delay optionally growing."""
    out = []
    for i in range(n):
        send = start_ns + i * interval_ns
        recv = send + base_delay + i * extra_delay_per_pkt
        out.append(PacketFeedback(send, recv, size))
    return out


def test_gcc_increases_when_clean():
    est = GccEstimator(start_bitrate=1_000_000)
    t = 0
    for round_ in range(20):
        fb = _feedback(t, 20, 10 * 10**6, 1200)
        est.process_feedback(fb)
        t += 20 * 10 * 10**6
    assert est.bitrate > 1_000_000
    assert est.last_usage is Usage.NORMAL


def test_gcc_backs_off_on_growing_delay():
    est = GccEstimator(start_bitrate=5_000_000)
    t, k = 0, 0
    for round_ in range(10):
        # sustained queue build-up: one-way delay keeps growing 3 ms
        # per packet across feedback batches
        fb = _feedback(t, 20, 10 * 10**6, 1200,
                       extra_delay_per_pkt=3 * 10**6,
                       base_delay=10**6 + k * 3 * 10**6)
        est.process_feedback(fb)
        t += 20 * 10 * 10**6
        k += 20
    assert est.last_usage is Usage.OVER
    assert est.bitrate < 5_000_000
    assert est.state is RateState.DECREASE


def test_gcc_loss_controller():
    est = GccEstimator(start_bitrate=2_000_000)
    fb = _feedback(0, 100, 10**7, 1200)
    for i in range(0, 100, 3):   # 33% loss
        fb[i] = PacketFeedback(fb[i].send_time, -1, 1200)
    est.process_feedback(fb)
    assert est.bitrate < 2_000_000


def test_gcc_element_messages():
    el = make("rtpgccbwe")
    from gstpu.core.harness import Harness
    h = Harness(el)
    h.set_caps("application/x-rtp")
    h.push(Buffer(b"\x80\x60" + bytes(10)))  # passthrough
    assert len(h.buffers) == 1
    fb = _feedback(0, 20, 10**7, 1200, extra_delay_per_pkt=3 * 10**6)
    el.feed_feedback(fb)
    from gstpu.core.element import MessageType
    msgs = [m for m in h.bus.drain() if m.type is MessageType.ELEMENT]
    assert msgs and "estimated_bitrate" in msgs[0].fields
    h.teardown()
