"""Sans-IO DTLS 1.2 / DTLS-SRTP handshake tests (RFC 6347/5764).

Client and server endpoints complete a mutual-auth handshake through
an in-memory exchange and derive matching SRTP keys — the data plane
the reference's webrtcbin2 gets from str0m."""

import pytest

from gstpu.net.webrtc.dtls import (DtlsEndpoint, DtlsError,
                                   fingerprint, generate_certificate)


def _pump(client, server, max_iters=30):
    for _ in range(max_iters):
        moved = False
        while True:
            d = client.poll_transmit()
            if d is None:
                break
            server.handle_packet(d)
            moved = True
        while True:
            d = server.poll_transmit()
            if d is None:
                break
            client.handle_packet(d)
            moved = True
        if not moved:
            break


def test_handshake_derives_matching_srtp_keys():
    ccert = generate_certificate("client")
    scert = generate_certificate("server")
    client = DtlsEndpoint(client=True, certificate=ccert,
                          remote_fingerprint=fingerprint(scert[1]))
    server = DtlsEndpoint(client=False, certificate=scert,
                          remote_fingerprint=fingerprint(ccert[1]))
    client.handshake()
    _pump(client, server)
    assert client.connected and server.connected
    assert client.srtp_profile == server.srtp_profile == 0x0001
    ck, sk = client.srtp_keys, server.srtp_keys
    assert ck == sk
    # directional split: client's send == server's recv
    assert ck.send_key_salt(True) == sk.recv_key_salt(False)
    assert sk.send_key_salt(False) == ck.recv_key_salt(True)
    assert len(ck.client_key) == 16 and len(ck.client_salt) == 14
    # both sides saw each other's certificates
    assert client.peer_cert is not None
    assert server.peer_cert is not None


def test_fingerprint_pinning_rejects_wrong_cert():
    ccert = generate_certificate("client")
    scert = generate_certificate("server")
    other = generate_certificate("mallory")
    client = DtlsEndpoint(client=True, certificate=ccert,
                          remote_fingerprint=fingerprint(other[1]))
    server = DtlsEndpoint(client=False, certificate=scert)
    client.handshake()
    with pytest.raises(DtlsError, match="fingerprint"):
        _pump(client, server)
    assert not client.connected


def test_cookie_exchange_happens():
    client = DtlsEndpoint(client=True)
    server = DtlsEndpoint(client=False)
    client.handshake()
    first = client.poll_transmit()
    server.handle_packet(first)
    hvr = server.poll_transmit()
    # HelloVerifyRequest record: handshake type 3 at the message head
    assert hvr[0] == 22 and hvr[13] == 3
    assert not server.connected
    client.handle_packet(hvr)
    _pump(client, server)
    assert client.connected and server.connected


def test_tampered_finished_fails():
    client = DtlsEndpoint(client=True)
    server = DtlsEndpoint(client=False)
    client.handshake()
    # run until the client emits its encrypted flight, then corrupt it
    with pytest.raises(Exception):
        for _ in range(10):
            d = client.poll_transmit()
            if d is None:
                d2 = server.poll_transmit()
                if d2 is None:
                    break
                client.handle_packet(d2)
                continue
            if d[0] == 22 and d[3:5] == b"\x00\x01":
                # epoch-1 handshake record (the Finished): flip a bit
                bad = bytearray(d)
                bad[-1] ^= 0xFF
                server.handle_packet(bytes(bad))
            else:
                server.handle_packet(d)
        raise AssertionError("corruption was not detected")
    assert not server.connected


def test_srtp_keys_drive_webrtcsend_recv():
    """The exported keying material feeds the existing SRTP stage
    (webrtcsend/webrtcrecv) end-to-end."""
    import struct

    from gstpu import Buffer, State
    from gstpu.core.registry import make
    from gstpu.net.srtp import SrtpContext

    client = DtlsEndpoint(client=True)
    server = DtlsEndpoint(client=False)
    client.handshake()
    _pump(client, server)
    key, salt = client.srtp_keys.send_key_salt(True)
    rkey, rsalt = server.srtp_keys.recv_key_salt(False)
    assert (key, salt) == (rkey, rsalt)
    tx = SrtpContext(key, salt)
    rx = SrtpContext(rkey, rsalt)
    pkt = (struct.pack(">BBHII", 0x80, 96, 7, 1000, 0xABCD)
           + b"media-payload")
    protected = tx.protect(pkt)
    assert protected != pkt
    out = rx.unprotect(protected)
    assert out == pkt


def test_webrtc_transport_full_chain():
    """ICE -> DTLS -> SRTP in one object: two WebRtcTransports
    complete connectivity + handshake through an in-memory network
    and exchange protected RTP (the webrtcbin2/str0m role)."""
    import struct

    from gstpu.net.webrtc.ice import host_candidate
    from gstpu.net.webrtc.transport import (RemoteDescription,
                                            WebRtcTransport)

    a = WebRtcTransport(controlling=True)
    b = WebRtcTransport(controlling=False, ice_lite=True)
    a_addr, b_addr = ("10.0.0.1", 5000), ("10.0.0.2", 6000)
    a.add_local_candidate(host_candidate(*a_addr))
    b.add_local_candidate(host_candidate(*b_addr))
    da, db = a.local_description(), b.local_description()
    assert da["setup"] == "active" and db["setup"] == "passive"
    from gstpu.net.webrtc.ice import Candidate
    b.set_remote_description(RemoteDescription(
        da["ice-ufrag"], da["ice-pwd"], da["fingerprint"],
        [Candidate.parse(c) for c in da["candidates"]]))
    a.set_remote_description(RemoteDescription(
        db["ice-ufrag"], db["ice-pwd"], db["fingerprint"],
        [Candidate.parse(c) for c in db["candidates"]]))

    received = []
    for _ in range(60):
        moved = False
        while True:
            t = a.poll_transmit()
            if t is None:
                break
            out = b.handle_packet(t[0], a_addr)
            if out:
                received.append(out)
            moved = True
        while True:
            t = b.poll_transmit()
            if t is None:
                break
            out = a.handle_packet(t[0], b_addr)
            if out:
                received.append(out)
            moved = True
        if a.connected and b.connected and not moved:
            break
    assert a.connected and b.connected

    # protected media flows a -> b
    pkt = (struct.pack(">BBHII", 0x80, 96, 1, 160, 0x1234)
           + b"opus-frame")
    assert a.send_rtp(pkt)
    data, to = a.poll_transmit()
    assert to == b_addr
    assert data != pkt and data[:4] != pkt[:4] or len(data) > len(pkt)
    kind, plain = b.handle_packet(data, a_addr)
    assert kind == "rtp" and plain == pkt


def test_webrtcsink_to_webrtcsrc_full_loop():
    """The complete in-process WebRTC session: webrtcsink producer and
    webrtcsrc consumer negotiate over the signalling protocol, run
    ICE + DTLS over real local UDP sockets, and media flows
    SRTP-protected end to end (the reference needs webrtcbin/str0m
    for this whole path)."""
    import struct
    import time

    from gstpu import Buffer, Caps, State
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    sink = make("webrtcsink", enable_data_transport=True)
    src = make("webrtcsrc", enable_data_transport=True)
    from gstpu.core.element import Bus
    sink.bus = Bus()
    src.bus = Bus()
    sink.set_state(State.PLAYING)
    src.set_state(State.PLAYING)

    # producer media input: pre-encoded alaw (payloader path)
    pad = sink.request_pad()
    feeder = Pad("feed", PadDirection.SRC,
                 PadTemplate("src", PadDirection.SRC,
                             PadPresence.ALWAYS, Caps.any()))
    feeder.link(pad)
    feeder.push_event(StreamStartEvent("a"))
    feeder.push_event(CapsEvent(parse_caps(
        "audio/x-alaw, rate=8000, channels=1")))
    feeder.push_event(SegmentEvent(Segment()))

    # signalling: shuttle the dicts between the two elements
    sink.signalling_connect({"peerId": "prod"})
    src.signalling_connect({"peerId": "cons"})
    msgs = src.handle_signalling(
        {"type": "list", "producers": [{"id": "prod"}]})
    assert msgs[0]["type"] == "startSession"
    offer_msgs = sink.handle_signalling(
        {"type": "startSession", "sessionId": "s1",
         "peerId": "cons"})
    assert "a=ice-ufrag:" in offer_msgs[0]["sdp"]["sdp"]
    answer_msgs = src.handle_signalling(
        {**offer_msgs[0], "sessionId": "s1"})
    assert answer_msgs[0]["sdp"]["type"] == "answer"
    sink.handle_signalling({**answer_msgs[0], "sessionId": "s1"})

    # pump both transports until connected
    deadline = time.monotonic() + 10
    tr = sink._transports["s1"][0]
    while time.monotonic() < deadline and not (
            tr.connected and src._transport
            and src._transport.connected):
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert tr.connected and src._transport.connected

    # capture the consumer's src pad
    out = []
    import gstpu
    cap = Pad("cap", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b)
                                       or gstpu.FlowReturn.OK)
    cap.event_function = lambda p, e: True
    src.srcpad.link(cap)

    # push media through the producer
    for i in range(5):
        feeder.push(Buffer(bytes([0x55]) * 160, pts=i * 20_000_000,
                           duration=20_000_000))
    deadline = time.monotonic() + 10
    while len(out) < 5 and time.monotonic() < deadline:
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert len(out) >= 5
    pkt = out[0].to_bytes()
    assert (pkt[0] >> 6) == 2               # RTP v2
    assert pkt[12:] == bytes([0x55]) * 160  # decrypted alaw payload

    # control data channel: SCTP over the same DTLS transport; the
    # consumer surfaces channel events as bus element messages
    def bus_msgs(el, name):
        out = []
        if el.bus is None:
            return out
        q = list(el.bus._queue) if hasattr(el.bus, "_queue") else []
        return [m for m in q
                if getattr(m, "fields", {}).get("name") == name]

    src_open = []
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and not src_open:
        sink.pump()
        src.pump()
        while (m := src.bus.pop()) is not None if src.bus else False:
            if m.fields.get("name") == "data-channel-open":
                src_open.append(m)
        time.sleep(0.001)
    assert src_open and src_open[0].label == "control"
    # wait for the DCEP ACK to reach the sink side, then message
    deadline = time.monotonic() + 10
    sent = False
    while time.monotonic() < deadline and not sent:
        sent = sink.send_control_message("s1", "hello consumer")
        sink.pump()
        src.pump()
        time.sleep(0.001)
    assert sent, "control channel never acked"
    deadline = time.monotonic() + 10
    got = []
    while time.monotonic() < deadline and not got:
        sink.pump()
        src.pump()
        while (m := src.bus.pop()) is not None if src.bus else False:
            if m.fields.get("name") == "data-channel-message":
                got.append(m)
        time.sleep(0.001)
    assert got and got[0].data == "hello consumer"
    # consumer replies on the same channel
    assert src.send_data_message("ack from consumer")
    deadline = time.monotonic() + 10
    reply = []
    while time.monotonic() < deadline and not reply:
        sink.pump()
        src.pump()
        while (m := sink.bus.pop()) is not None if sink.bus else False:
            if m.fields.get("name") == "data-channel-message":
                reply.append(m)
        time.sleep(0.001)
    assert reply and reply[0].data == "ack from consumer"
    sink.set_state(State.NULL)
    src.set_state(State.NULL)


def test_forged_finished_without_key_exchange_rejected():
    """Review regression: a Finished computed over the empty master
    (PRF key b'') must not complete the handshake."""
    import hashlib
    import hmac as _hmac
    import struct

    from gstpu.net.webrtc.dtls import DtlsError, _prf

    server = DtlsEndpoint(client=False)
    # craft verify_data exactly as a pre-fix attacker would
    verify = _prf(b"", b"client finished",
                  hashlib.sha256(b"").digest(), 12)
    msg = (bytes([20]) + len(verify).to_bytes(3, "big")
           + struct.pack(">H", 0) + (0).to_bytes(3, "big")
           + len(verify).to_bytes(3, "big") + verify)
    rec = (struct.pack(">BHH", 22, 0xFEFD, 0)
           + (0).to_bytes(6, "big")
           + struct.pack(">H", len(msg)) + msg)
    with pytest.raises(DtlsError):
        server.handle_packet(rec)
    assert not server.connected
    assert server.srtp_keys is None


def test_client_skipping_certificate_rejected():
    """Review regression: the server demands client auth; a client
    flight without Certificate/CertificateVerify must fail."""
    from gstpu.net.webrtc.dtls import DtlsError

    client = DtlsEndpoint(client=True)
    server = DtlsEndpoint(client=False)
    # monkeypatch the client to ignore the CertificateRequest
    orig = client._dispatch_client

    def no_cert(ht, body, raw):
        if ht == 13:                   # CertificateRequest
            client._transcript += raw  # keep transcript aligned
            return
        return orig(ht, body, raw)
    client._dispatch_client = no_cert
    client.handshake()
    with pytest.raises(DtlsError, match="certificate"):
        _pump(client, server)
    assert not server.connected


def test_garbage_datagrams_raise_dtlserror_only():
    from gstpu.net.webrtc.dtls import DtlsError
    server = DtlsEndpoint(client=False)
    import struct
    bad = [
        b"\x16\xfe\xfd" + bytes(20),                 # truncated
        # ClientHello with a bogus non-empty cookie (pre-fix: crash)
        struct.pack(">BHH", 22, 0xFEFD, 0) + bytes(6)
        + struct.pack(">H", 60)
        + bytes([1]) + (48).to_bytes(3, "big") + bytes(8)
        + struct.pack(">H", 0xFEFD) + bytes(32) + b"\x00"
        + bytes([8]) + b"badcooki" + b"\x00\x02\xc0\x2b\x01\x00",
        struct.pack(">BHH", 21, 0xFEFD, 0) + bytes(6)
        + struct.pack(">H", 2) + b"\x02\x28",        # alert
    ]
    for dgram in bad:
        try:
            server.handle_packet(dgram)
        except DtlsError:
            pass        # expected: typed error, never bare crashes
    assert not server.connected
