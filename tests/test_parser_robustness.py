"""Adversarial-input robustness for the round-2 wire parsers: random
and truncated garbage must raise the module's typed error (or return
cleanly) — never IndexError/struct.error/KeyError crashes.

Mirrors the reference's posture of failing malformed input gracefully
(e.g. rtp basedepay drop-on-parse-error)."""

import os
import random

import pytest


def _garbage(seed, n=256):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(rng.randrange(n)))


def test_quic_packet_parser_rejects_garbage():
    from gstpu.net.quic.connection import QuicConnection
    from gstpu.net.quic.packet import QuicError
    srv = QuicConnection(client=False)
    for seed in range(200):
        data = _garbage(seed)
        try:
            srv.handle_datagram(data)
        except QuicError:
            pass


def test_sctp_parser_rejects_garbage():
    from gstpu.net.webrtc.sctp import SctpAssociation, SctpError
    a = SctpAssociation(client=False)
    for seed in range(200):
        try:
            a.handle_packet(_garbage(seed))
        except SctpError:
            pass


def test_eventstream_rejects_garbage():
    from gstpu.net.aws.eventstream import (EventStreamError,
                                           decode_message)
    for seed in range(200):
        try:
            decode_message(_garbage(seed, 64))
        except EventStreamError:
            pass


def test_qpack_rejects_garbage():
    from gstpu.net.quic.webtransport import WtError, qpack_decode
    for seed in range(200):
        try:
            qpack_decode(_garbage(seed, 64))
        except (WtError, UnicodeDecodeError):
            pass


def test_brotli_rejects_garbage():
    from gstpu.codecs.brotli_rfc7932 import BrotliError, decompress
    for seed in range(200):
        try:
            decompress(_garbage(seed, 64))
        except BrotliError:
            pass


def test_flv_parser_survives_byte_dribble():
    from gstpu.mux.flv import FlvParser, FlvWriter
    w = FlvWriter()
    w.audio_tag(0, b"\x01" * 40, sound_format=2)
    data = w.to_bytes()
    p = FlvParser()
    tags = []
    for i in range(len(data)):
        p.push(data[i:i + 1])
        while (t := p.poll()) is not None:
            tags.append(t)
    assert len(tags) == 1


def test_ws_frame_decoder_survives_garbage():
    """ws_recv on a socket feeding garbage must return None or raise
    OSError-family, not crash the server loop."""
    import socket
    import threading

    from gstpu.net.webrtc.signalling import ws_recv

    a, b = socket.socketpair()
    try:
        for seed in range(10):
            g = _garbage(seed, 32)
            if not g:
                continue
            a.sendall(g)
        a.close()
        b.settimeout(2)
        for _ in range(20):
            try:
                if ws_recv(b) is None:
                    break
            except (OSError, TimeoutError):
                break
    finally:
        b.close()


def test_twcc_rejects_garbage():
    from gstpu.net.rtp.twcc import TwccError, parse_feedback
    for seed in range(200):
        try:
            parse_feedback(_garbage(seed, 64))
        except TwccError:
            pass


def test_srtcp_rejects_garbage():
    from gstpu.net.srtp import SrtcpContext
    ctx = SrtcpContext(bytes(16), bytes(14))
    for seed in range(200):
        try:
            ctx.unprotect(_garbage(seed, 64))
        except ValueError:
            pass
