"""Anti-replay windows (gstpu/net/replay.py) and their wiring into
SRTP/SRTCP (RFC 3711 §3.3.2 mandates a replay list) and the DTLS
record layer — advisor r2: the previous clear()-when-full sets
re-enabled replay of every previously seen index."""

import struct

import pytest

from gstpu.net.replay import ReplayWindow
from gstpu.net.srtp import SrtcpContext, SrtpContext


def test_window_basics():
    w = ReplayWindow(size=64)
    assert not w.is_replay(0)
    w.accept(0)
    assert w.is_replay(0)
    assert not w.is_replay(5)
    w.accept(5)
    assert w.is_replay(5) and w.is_replay(0)
    # out-of-order inside window is fresh once
    assert not w.is_replay(3)
    w.accept(3)
    assert w.is_replay(3)
    # older than the window: rejected
    w.accept(200)
    assert w.is_replay(100)
    assert not w.is_replay(199)


def test_window_large_jump():
    w = ReplayWindow(size=64)
    w.accept(10)
    w.accept(10_000_000)          # shift far beyond window size
    assert w.is_replay(10) and w.is_replay(9_999_000)
    assert not w.is_replay(9_999_990)


def _rtp(seq, ssrc=0x1234, payload=b"\xAB" * 32):
    return struct.pack(">BBHII", 0x80, 96, seq, 1000 + seq,
                       ssrc) + payload


def test_srtp_replay_rejected():
    key, salt = b"\x01" * 16, b"\x02" * 14
    tx, rx = SrtpContext(key, salt), SrtpContext(key, salt)
    pkt = tx.protect(_rtp(100))
    assert rx.unprotect(pkt)[:12] == _rtp(100)[:12]
    with pytest.raises(ValueError, match="replay"):
        rx.unprotect(pkt)          # captured packet re-injected
    # later packets still flow; the old one stays dead
    for seq in range(101, 140):
        rx.unprotect(tx.protect(_rtp(seq)))
    with pytest.raises(ValueError, match="replay"):
        rx.unprotect(pkt)


def test_srtp_out_of_order_ok_but_replay_caught():
    key, salt = b"\x03" * 16, b"\x04" * 14
    tx, rx = SrtpContext(key, salt), SrtpContext(key, salt)
    pkts = [tx.protect(_rtp(s)) for s in range(50, 60)]
    rx.unprotect(pkts[5])
    rx.unprotect(pkts[2])          # out-of-order: fine
    with pytest.raises(ValueError, match="replay"):
        rx.unprotect(pkts[2])


def test_srtp_forged_packet_does_not_poison_window():
    key, salt = b"\x05" * 16, b"\x06" * 14
    tx, rx = SrtpContext(key, salt), SrtpContext(key, salt)
    good = tx.protect(_rtp(7))
    forged = good[:-1] + bytes([good[-1] ^ 1])
    with pytest.raises(ValueError, match="auth"):
        rx.unprotect(forged)
    # the genuine packet must still be accepted
    assert rx.unprotect(good)[:12] == _rtp(7)[:12]


def test_srtcp_replay_rejected_even_after_many():
    key, salt = b"\x07" * 16, b"\x08" * 14
    tx, rx = SrtcpContext(key, salt), SrtcpContext(key, salt)
    rtcp = struct.pack(">BBHI", 0x80, 200, 6,
                       0x99) + b"\x00" * 20
    first = tx.protect(rtcp)
    assert rx.unprotect(first) == rtcp
    for _ in range(300):
        rx.unprotect(tx.protect(rtcp))
    with pytest.raises(ValueError, match="replay"):
        rx.unprotect(first)
