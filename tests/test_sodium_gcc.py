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


pytestmark_sodium = pytest.mark.skipif(
    not __import__("gstpu.elements.generic.sodium",
                   fromlist=["sodium_available"]).sodium_available(),
    reason="libsodium not present")


def _keys():
    from gstpu.elements.generic.sodium import generate_keypair
    return generate_keypair(), generate_keypair()


def test_sodium_roundtrip_pipeline():
    from gstpu.core.caps import parse_caps
    (rpk, rsk), (spk, ssk) = _keys()
    p = parse_launch("appsrc name=src ! sodiumencrypter name=enc ! "
                     "sodiumdecrypter name=dec ! appsink name=sink")
    enc, dec = p.get_by_name("enc"), p.get_by_name("dec")
    enc.receiver_key, enc.sender_key = rpk, ssk
    enc.block_size = 64
    dec.receiver_key, dec.sender_key = rsk, spk
    src, sink = p.get_by_name("src"), p.get_by_name("sink")
    src.caps = parse_caps("application/x-test")
    p.set_state(State.PLAYING)
    payload = bytes(range(256)) * 3   # 768 bytes -> 12 blocks
    src.push_buffer(Buffer(payload))
    src.end_of_stream()
    p.run()
    out = b"".join(b.to_bytes() for b in sink.pull_all())
    assert out == payload
    assert sink.is_eos
    p.set_state(State.NULL)


def test_sodium_wire_format_matches_reference():
    """Byte-level check of the reference stream layout
    (generic/sodium/src/lib.rs + encrypter/imp.rs): magic, nonce,
    LE block size, crypto_box chunks with LE-incremented nonces —
    verified against direct (non-precomputed) libsodium calls."""
    import ctypes
    from gstpu.core.harness import Harness
    from gstpu.elements.generic.sodium import _SODIUM, MAC_BYTES
    (rpk, rsk), (spk, ssk) = _keys()
    nonce0 = bytes(range(24))
    enc = make("sodiumencrypter", receiver_key=rpk, sender_key=ssk,
               nonce=nonce0, block_size=8)
    h = Harness(enc)
    h.set_caps("application/x-test")
    h.push(Buffer(b"0123456789abcdef"))  # exactly 2 blocks
    h.push_eos()
    data = b"".join(b.to_bytes() for b in h.pull_all())
    h.teardown()
    assert data[:12] == b"gst-sodium10"
    assert data[12:36] == nonce0
    assert data[36:40] == (8).to_bytes(4, "little")
    blocks = data[40:]
    assert len(blocks) == 2 * (8 + MAC_BYTES)
    # independent decrypt with crypto_box_open_easy (no precompute)
    def open_direct(sealed, nonce):
        out = ctypes.create_string_buffer(len(sealed) - MAC_BYTES)
        rc = _SODIUM.crypto_box_open_easy(
            out, sealed, ctypes.c_ulonglong(len(sealed)), nonce,
            spk, rsk)
        assert rc == 0, "direct libsodium decrypt failed"
        return out.raw
    n1 = bytearray(nonce0)
    n1[0] += 1   # little-endian increment of 00 01 02 ...
    assert open_direct(blocks[:24], nonce0) == b"01234567"
    assert open_direct(blocks[24:], bytes(n1)) == b"89abcdef"


def test_sodium_wrong_key_fails():
    from gstpu.core.harness import Harness
    (rpk, rsk), (spk, ssk) = _keys()
    enc = make("sodiumencrypter", receiver_key=rpk, sender_key=ssk,
               block_size=16)
    h = Harness(enc)
    h.set_caps("application/x-test")
    h.push(Buffer(bytes(32)))
    h.push_eos()
    ct = b"".join(b.to_bytes() for b in h.pull_all())
    h.teardown()
    from gstpu import FlowReturn
    (wpk, wsk), _ = _keys()
    dec = make("sodiumdecrypter", receiver_key=wsk, sender_key=spk)
    h2 = Harness(dec)
    h2.set_caps("application/x-sodium-encrypted-stream")
    ret = h2.push(Buffer(ct))
    assert ret == FlowReturn.ERROR
    assert not h2.buffers
    h2.teardown()


def test_sodium_tamper_detected():
    from gstpu.core.harness import Harness
    (rpk, rsk), (spk, ssk) = _keys()
    enc = make("sodiumencrypter", receiver_key=rpk, sender_key=ssk,
               block_size=16)
    h = Harness(enc)
    h.set_caps("application/x-test")
    h.push(Buffer(bytes(32)))
    h.push_eos()
    ct = bytearray(b"".join(b.to_bytes() for b in h.pull_all()))
    h.teardown()
    from gstpu import FlowReturn
    ct[45] ^= 0xFF   # flip a ciphertext bit
    dec = make("sodiumdecrypter", receiver_key=rsk, sender_key=spk)
    h2 = Harness(dec)
    h2.set_caps("application/x-sodium-encrypted-stream")
    ret = h2.push(Buffer(bytes(ct)))
    assert ret == FlowReturn.ERROR
    assert not h2.buffers
    h2.teardown()


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


def test_sodium_pull_mode_random_access(tmp_path):
    """Pull-mode decrypter (reference decrypter/imp.rs:412-511):
    filesrc serves getrange; sodiumdecrypter maps plaintext ranges to
    chunks, decrypts with nonce+index, and slices — byte-identical to
    the full plaintext at arbitrary offsets."""
    (rpk, rsk), (spk, ssk) = _keys()
    payload = bytes((i * 7 + 3) & 0xFF for i in range(10_000))

    # write an encrypted file via the push path
    enc_file = tmp_path / "enc.bin"
    p = parse_launch("appsrc name=src ! sodiumencrypter name=enc ! "
                     f"filesink location={enc_file}")
    from gstpu.core.caps import parse_caps
    enc = p.get_by_name("enc")
    enc.receiver_key, enc.sender_key = rpk, ssk
    enc.block_size = 512
    src = p.get_by_name("src")
    src.caps = parse_caps("application/x-test")
    p.set_state(State.PLAYING)
    src.push_buffer(Buffer(payload))
    src.end_of_stream()
    p.run()
    p.set_state(State.NULL)

    # pull-mode pipeline: filesrc ! sodiumdecrypter (getrange chain)
    fsrc = make("filesrc")
    fsrc.location = str(enc_file)
    dec = make("sodiumdecrypter")
    dec.receiver_key, dec.sender_key = rsk, spk
    fsrc.pads["src"].link(dec.pads["sink"])
    fsrc.set_state(State.READY)
    dec.set_state(State.PAUSED)

    assert dec.plaintext_size() == len(payload)
    # arbitrary offsets incl. chunk-straddling and the tail
    for off, size in ((0, 16), (500, 40), (511, 2), (512, 512),
                      (1000, 3000), (9990, 10), (9990, 100),
                      (4096, 1)):
        got = dec.pull_range(off, size)
        assert got == payload[off:off + size], (off, size)

    # downstream sees getrange through the decrypter's src pad
    sinkpad_probe = dec.pads["src"].get_range_function
    assert sinkpad_probe is not None
    assert sinkpad_probe(dec.pads["src"], 100, 50) == payload[100:150]

    # tampering any chunk fails authentication for ranges in it
    raw = bytearray(enc_file.read_bytes())
    raw[60] ^= 0xFF                      # inside chunk 0
    enc_file.write_bytes(bytes(raw))
    fsrc.set_state(State.NULL)
    fsrc.set_state(State.READY)
    with pytest.raises(Exception):
        dec.pull_range(0, 16)
