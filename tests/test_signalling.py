"""WebRTC signalling: sans-IO session flow + live WebSocket server."""

import json
import socket
import time

import pytest

from gstpu.net.webrtc.signalling import (Server, SignallingServer,
                                         peer_ice, peer_sdp, ws_recv,
                                         ws_send)


def test_session_flow_sans_io():
    s = Server()
    prod, out = s.handle_connect()
    assert out[0][1]["type"] == "welcome"
    cons, _ = s.handle_connect()
    listener, _ = s.handle_connect()

    s.handle_message(listener, {"type": "setPeerStatus",
                                "roles": ["listener"]})
    out = s.handle_message(prod, {"type": "setPeerStatus",
                                  "roles": ["producer"],
                                  "meta": {"name": "cam1"}})
    # listener notified of the new producer
    targets = {t for t, m in out}
    assert listener in targets

    out = s.handle_message(cons, {"type": "list"})
    assert out[0][1]["producers"][0]["id"] == prod
    assert out[0][1]["producers"][0]["meta"] == {"name": "cam1"}

    out = s.handle_message(cons, {"type": "startSession",
                                  "peerId": prod})
    by_target = dict(out)
    sid = by_target[cons]["sessionId"]
    assert by_target[prod]["type"] == "startSession"
    assert by_target[prod]["peerId"] == cons

    # SDP offer producer -> consumer, answer back, ICE both ways
    out = s.handle_message(prod, peer_sdp(sid, "offer", "v=0..."))
    assert out == [(cons, peer_sdp(sid, "offer", "v=0..."))]
    out = s.handle_message(cons, peer_sdp(sid, "answer", "v=0..a"))
    assert out == [(prod, peer_sdp(sid, "answer", "v=0..a"))]
    out = s.handle_message(prod, peer_ice(sid, "candidate:1", 0))
    assert out[0][0] == cons

    # end session notifies the other side
    out = s.handle_message(cons, {"type": "endSession",
                                  "sessionId": sid})
    assert out == [(prod, {"type": "endSession", "sessionId": sid})]


def test_disconnect_ends_sessions():
    s = Server()
    prod, _ = s.handle_connect()
    cons, _ = s.handle_connect()
    s.handle_message(prod, {"type": "setPeerStatus",
                            "roles": ["producer"]})
    out = s.handle_message(cons, {"type": "startSession",
                                  "peerId": prod})
    sid = dict(out)[cons]["sessionId"]
    out = s.handle_disconnect(prod)
    assert (cons, {"type": "endSession", "sessionId": sid}) in out


def test_unknown_session_errors():
    s = Server()
    p, _ = s.handle_connect()
    out = s.handle_message(p, peer_sdp("nope", "offer", "x"))
    assert out[0][1]["type"] == "error"


def _ws_connect(port):
    conn = socket.create_connection(("127.0.0.1", port), timeout=5)
    conn.sendall(b"GET / HTTP/1.1\r\nHost: localhost\r\n"
                 b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                 b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                 b"Sec-WebSocket-Version: 13\r\n\r\n")
    data = b""
    while b"\r\n\r\n" not in data:
        data += conn.recv(1)  # byte-wise: don't swallow the first frame
    assert b"101" in data.split(b"\r\n")[0]
    return conn


def _recv_json(conn):
    data = ws_recv(conn)
    assert data is not None
    return json.loads(data)


def test_websocket_server_end_to_end():
    srv = SignallingServer()
    srv.start()
    try:
        prod = _ws_connect(srv.port)
        prod_welcome = _recv_json(prod)
        assert prod_welcome["type"] == "welcome"
        prod_id = prod_welcome["peerId"]

        cons = _ws_connect(srv.port)
        cons_id = _recv_json(cons)["peerId"]

        ws_send(prod, json.dumps({"type": "setPeerStatus",
                                  "roles": ["producer"]}).encode())
        assert _recv_json(prod)["type"] == "peerStatusChanged"

        ws_send(cons, json.dumps({"type": "startSession",
                                  "peerId": prod_id}).encode())
        started = _recv_json(cons)
        assert started["type"] == "sessionStarted"
        sid = started["sessionId"]
        incoming = _recv_json(prod)
        assert incoming["type"] == "startSession"
        assert incoming["peerId"] == cons_id

        # sdp forwarded producer -> consumer
        ws_send(prod, json.dumps(peer_sdp(sid, "offer", "v=0")).encode())
        fwd = _recv_json(cons)
        assert fwd["sdp"]["sdp"] == "v=0"
        prod.close()
        # consumer sees the session end when the producer vanishes
        ended = _recv_json(cons)
        assert ended == {"type": "endSession", "sessionId": sid}
        cons.close()
    finally:
        srv.stop()


# -- WHIP/WHEP sans-IO --------------------------------------------------

def _whip_pair():
    from gstpu.net.webrtc.whip import WhipClientSession, WhipServer
    server = WhipServer(lambda sid, offer: offer.replace("offer",
                                                         "answer"))
    client = WhipClientSession("/whip", auth_token="tok")
    return client, server


def test_whip_post_flow():
    client, server = _whip_pair()
    req = client.post_offer("v=0 offer")
    assert req.method == "POST"
    assert req.headers["Authorization"] == "Bearer tok"
    resp = server.handle_request(req)
    assert resp.status == 201 and "Location" in resp.headers
    assert client.handle_response(resp) is None
    assert client.state == "active"
    assert client.answer_sdp == "v=0 answer"
    # trickle ICE then teardown
    patch = client.trickle("a=candidate:1")
    assert server.handle_request(patch).status == 204
    sid = client.resource_url.rsplit("/", 1)[1]
    assert server.sessions[sid]["candidates"] == ["a=candidate:1"]
    dele = client.teardown()
    assert server.handle_request(dele).status == 200
    assert not server.sessions
    assert server.handle_request(patch).status == 404  # gone


def test_whip_redirect_repost():
    from gstpu.net.webrtc.whip import HttpResponse
    client, server = _whip_pair()
    req = client.post_offer("v=0 offer")
    follow = client.handle_response(
        HttpResponse(307, {"Location": "/whip"}))
    assert follow is not None and follow.method == "POST"
    assert follow.url == "/whip"
    resp = server.handle_request(follow)
    client.handle_response(resp)
    assert client.state == "active"


def test_whip_server_validation():
    from gstpu.net.webrtc.whip import HttpRequest
    client, server = _whip_pair()
    # wrong content type
    assert server.handle_request(HttpRequest(
        "POST", "/whip", {"Content-Type": "text/plain"},
        b"x")).status == 415
    # OPTIONS advertises POST
    opt = server.handle_request(HttpRequest("OPTIONS", "/whip"))
    assert opt.status == 204
    assert opt.headers["Accept-Post"] == "application/sdp"
    # unknown resource
    assert server.handle_request(HttpRequest(
        "DELETE", "/whip/resource/nope")).status == 404


def test_whip_client_rejects_missing_location():
    from gstpu.net.webrtc.whip import HttpResponse
    client, _ = _whip_pair()
    client.post_offer("v=0")
    with pytest.raises(RuntimeError, match="Location"):
        client.handle_response(HttpResponse(201, {}, b"v=0"))


def test_whep_same_machine():
    from gstpu.net.webrtc.whip import WhepClientSession, WhepServer
    server = WhepServer(lambda sid, offer: "v=0 send-only-answer")
    client = WhepClientSession("/whep")
    resp = server.handle_request(client.post_offer("v=0 recv"))
    client.handle_response(resp)
    assert client.answer_sdp == "v=0 send-only-answer"
    assert client.resource_url.startswith("/whep/resource/")


# -- RoQ framing ----------------------------------------------------------

def test_roq_varints():
    from gstpu.net.roq import decode_varint, encode_varint
    for v in (0, 63, 64, 16383, 16384, 2**30 - 1, 2**30, 2**62 - 1):
        data = encode_varint(v)
        back, pos = decode_varint(data)
        assert back == v and pos == len(data)
    with pytest.raises(ValueError):
        encode_varint(2**62)


def test_roq_datagram_and_stream():
    from gstpu.net.roq import (RoqStreamMux, RoqStreamParser,
                               demux_datagram, mux_datagram)
    pkt = b"\x80\x60" + bytes(40)
    dg = mux_datagram(70000, pkt)
    assert demux_datagram(dg) == (70000, pkt)

    mux = RoqStreamMux(flow_id=5)
    wire = mux.frame(pkt) + mux.frame(pkt[:7])
    parser = RoqStreamParser()
    # drip-feed byte by byte: parser must reassemble across pushes
    out = []
    for i in range(len(wire)):
        out.extend(parser.push(wire[i:i + 1]))
    assert parser.flow_id == 5
    assert out == [pkt, pkt[:7]]


# -- webrtcsink producer shell -------------------------------------------

def test_webrtcsink_full_session_flow():
    from gstpu import Buffer, Caps, FlowReturn, State
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make
    from gstpu.net.webrtc.signalling import Server
    from gstpu.net.rtp.packet import RtpPacket

    server = Server()
    sink = make("webrtcsink", display_name="cam-1")
    sink.set_state(State.PLAYING)

    # producer connects + announces
    prod_id, msgs = server.handle_connect()
    outgoing = sink.signalling_connect(msgs[0][1])
    for m in outgoing:
        server.handle_message(prod_id, m)

    # a consumer lists producers and starts a session
    cons_id, _ = server.handle_connect()
    lst = server.handle_message(cons_id, {"type": "list"})
    assert lst[0][1]["producers"][0]["meta"]["name"] == "cam-1"

    # media pad first so the offer has an m-line
    vpad = sink.request_pad()
    feed = Pad("f", PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                           Caps.any()))
    feed.link(vpad)
    feed.push_event(StreamStartEvent("v"))
    feed.push_event(CapsEvent(parse_caps("video/x-vp8")))
    feed.push_event(SegmentEvent(Segment()))
    feed.push(Buffer(b"\x10frame0", pts=0))   # creates the payloader

    out = server.handle_message(cons_id, {"type": "startSession",
                                          "peerId": prod_id})
    start = next(m for to, m in out if to == prod_id)
    replies = sink.handle_signalling(start)
    assert replies and replies[0]["type"] == "peer"
    sdp = replies[0]["sdp"]["sdp"]
    assert "m=video" in sdp and "VP8/90000" in sdp

    # consumer's session pad carries the payloaded RTP
    sid = start["sessionId"]
    spad = sink.static_pad(f"session_{sid}")
    got = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (got.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    spad.link(cap)
    feed.push(Buffer(b"\x10frame1", pts=33_000_000))
    assert got
    pkt = RtpPacket.parse(got[0].to_bytes())
    assert pkt.payload.endswith(b"frame1")

    # teardown removes the pad and posts a message
    from gstpu.core.element import Bus
    sink.bus = Bus()
    sink.handle_signalling({"type": "endSession", "sessionId": sid})
    assert sink.static_pad(f"session_{sid}") is None
    sink.set_state(State.NULL)


# -- SRTP / webrtcsend / webrtcrecv ---------------------------------------

def test_srtp_rfc3711_key_derivation_vectors():
    from gstpu.net.srtp import derive_session_keys
    mk = bytes.fromhex("E1F97A0D3E018BE0D64FA32C06DE4139")
    ms = bytes.fromhex("0EC675AD498AFEEBB6960B3AABE6")
    ck, ak, salt = derive_session_keys(mk, ms)
    assert ck.hex().upper() == "C61E7A93744F39EE10734AFE3FF7A087"
    assert salt.hex().upper() == "30CBBC08863D8C85D49DB34A9AE1"
    assert ak.hex().upper() == \
        "CEBE321F6FF7716B6FD4AB49AF256A156D38BAA4"


def test_srtp_protect_roundtrip_and_tamper():
    from gstpu.net.rtp.packet import RtpPacket
    from gstpu.net.srtp import AUTH_TAG_LEN, SrtpContext
    mk, ms = bytes(range(16)), bytes(range(14))
    tx, rx = SrtpContext(mk, ms), SrtpContext(mk, ms)
    for seq in (0xFFFE, 0xFFFF, 0, 1, 2):   # crosses seq rollover
        pkt = RtpPacket(payload_type=96, seqnum=seq, timestamp=0,
                        ssrc=7, payload=bytes(range(32))).to_bytes()
        prot = tx.protect(pkt)
        assert len(prot) == len(pkt) + AUTH_TAG_LEN
        assert prot[:12] == pkt[:12]        # header in clear
        assert prot[12:-AUTH_TAG_LEN] != pkt[12:]
        assert rx.unprotect(prot) == pkt
    # tamper a FRESH seq (a replayed index is rejected as replay
    # before the auth check even runs)
    pkt = RtpPacket(payload_type=96, seqnum=3, timestamp=0,
                    ssrc=7, payload=bytes(range(32))).to_bytes()
    bad = bytearray(tx.protect(pkt))
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="auth"):
        rx.unprotect(bytes(bad))


def test_srtp_forged_packet_does_not_poison_roc():
    """ADVICE r1 (high): RFC 3711 §3.3.1 — ROC/s_l update only after
    authentication.  A forged packet with a seqnum past the 16-bit
    wrap boundary must not advance the receiver ROC; genuine packets
    keep decrypting afterwards."""
    from gstpu.net.rtp.packet import RtpPacket
    from gstpu.net.srtp import SrtpContext
    mk, ms = bytes(range(16)), bytes(range(14))
    tx, rx = SrtpContext(mk, ms), SrtpContext(mk, ms)

    def mkpkt(seq):
        return RtpPacket(payload_type=96, seqnum=seq, timestamp=0,
                         ssrc=9, payload=b"x" * 24).to_bytes()

    # establish state high in the seq space
    assert rx.unprotect(tx.protect(mkpkt(0xFFF0))) == mkpkt(0xFFF0)
    # forged packet: small seqnum (looks like a wrap -> roc+1), junk tag
    forged = bytearray(tx.protect(mkpkt(0xFFF1)))
    forged[2:4] = (5).to_bytes(2, "big")    # seq 5: wrap candidate
    with pytest.raises(ValueError, match="auth"):
        rx.unprotect(bytes(forged))
    # genuine in-cycle packets must still authenticate
    for seq in (0xFFF2, 0xFFF3):
        assert rx.unprotect(tx.protect(mkpkt(seq))) == mkpkt(seq)
    # and a genuine wrap still advances the ROC correctly
    for seq in (0xFFFF, 0, 1):
        assert rx.unprotect(tx.protect(mkpkt(seq))) == mkpkt(seq)
    assert rx._roc[9] == 1


def test_webrtcsend_recv_pipeline():
    from gstpu import Buffer, State, parse_launch
    from gstpu.net.rtp.packet import RtpPacket
    key = (bytes(range(16)) + bytes(range(14))).hex()
    p = parse_launch(f'appsrc name=src caps="application/x-rtp" ! '
                     f'webrtcsend key={key} ! webrtcrecv key={key} ! '
                     f'appsink name=out')
    src = p.get_by_name("src")
    p.set_state(State.PLAYING)
    pkts = [RtpPacket(payload_type=96, seqnum=i, timestamp=i * 90,
                      ssrc=3, payload=bytes([i]) * 20).to_bytes()
            for i in range(5)]
    for q in pkts:
        src.push_buffer(Buffer(q))
    src.end_of_stream()
    p.run()
    out = [b.to_bytes() for b in p.get_by_name("out").pull_all()]
    assert out == pkts
    p.set_state(State.NULL)


def test_whip_elements_end_to_end():
    """whipclientsink publishes through whipserversrc's endpoint:
    HTTP records shuttle between the two elements, then RTP flows
    once the resource is active."""
    from gstpu import Buffer, Caps, FlowReturn, State
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    srv = make("whipserversrc", answer_sdp="v=0\r\ns=ok\r\n")
    cli = make("whipclientsink", whip_endpoint="/whip",
               auth_token="tok")
    cli.set_state(State.PLAYING)

    # client -> server offer; server answers; client activates
    req = cli.post_offer("v=0 publish")
    resp = srv.handle_request(req)
    assert resp.status == 201
    assert cli.handle_response(resp) is None
    assert cli.session.state == "active"
    sid = cli.session.resource_url.rsplit("/", 1)[1]

    # server side session pad exists; capture both ends
    spad = srv.static_pad(f"session_{sid}")
    assert spad is not None

    got_cli = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (got_cli.append(b),
                                       FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    cli.static_pad("rtp").link(cap)

    feed = Pad("f", PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC,
                           PadPresence.ALWAYS, Caps.any()))
    feed.link(cli.static_pad("sink"))
    feed.push_event(StreamStartEvent("s"))
    feed.push_event(CapsEvent(Caps.new("application/x-rtp")))
    feed.push_event(SegmentEvent(Segment()))
    feed.push(Buffer(b"rtp-bytes"))
    assert [b.to_bytes() for b in got_cli] == [b"rtp-bytes"]

    # ingest side: app injects received rtp onto the session pad
    got_srv = []
    cap2 = Pad("c2", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    cap2.chain_function = lambda p, b: (got_srv.append(b),
                                        FlowReturn.OK)[1]
    cap2.event_function = lambda p, e: True
    spad.link(cap2)
    srv.push_rtp(sid, b"ingested")
    assert [b.to_bytes() for b in got_srv] == [b"ingested"]

    # DELETE tears the session pad down
    srv.handle_request(cli.teardown_request()) \
        if hasattr(cli, "teardown_request") else \
        srv.handle_request(cli.session.teardown())
    assert srv.static_pad(f"session_{sid}") is None
    cli.set_state(State.NULL)


def test_whep_elements_fanout():
    from gstpu import Buffer, Caps, FlowReturn, State
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make

    sink = make("whepserversink", answer_sdp="v=0\r\n")
    src = make("whepsrc", whep_endpoint="/whep")
    src.set_state(State.PLAYING)
    resp = sink.handle_request(src.post_offer("v=0 recv"))
    src.handle_response(resp)
    sid = src.session.resource_url.rsplit("/", 1)[1]

    got = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (got.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    sink.static_pad(f"session_{sid}").link(cap)

    feed = Pad("f", PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC,
                           PadPresence.ALWAYS, Caps.any()))
    feed.link(sink.static_pad("sink"))
    feed.push_event(StreamStartEvent("s"))
    feed.push_event(CapsEvent(Caps.new("application/x-rtp")))
    feed.push_event(SegmentEvent(Segment()))
    feed.push(Buffer(b"media"))
    assert [b.to_bytes() for b in got] == [b"media"]

    # consumer side surfaces injected media on its src pad
    out = []
    cap2 = Pad("c2", PadDirection.SINK,
               PadTemplate("sink", PadDirection.SINK,
                           PadPresence.ALWAYS, Caps.any()))
    cap2.chain_function = lambda p, b: (out.append(b),
                                        FlowReturn.OK)[1]
    cap2.event_function = lambda p, e: True
    src.static_pad("src").link(cap2)
    src.push_rtp(got[0].to_bytes())
    assert [b.to_bytes() for b in out] == [b"media"]
    src.set_state(State.NULL)


def test_webrtcsink_to_webrtcsrc_session():
    """Producer and consumer elements complete a session through the
    sans-IO server; RTP flows session pad -> consumer src pad."""
    from gstpu import Buffer, Caps, FlowReturn, State
    from gstpu.core.caps import parse_caps
    from gstpu.core.element import (Pad, PadDirection, PadPresence,
                                    PadTemplate)
    from gstpu.core.event import (CapsEvent, Segment, SegmentEvent,
                                  StreamStartEvent)
    from gstpu.core.registry import make
    from gstpu.net.webrtc.signalling import Server

    server = Server()
    sink = make("webrtcsink")
    src = make("webrtcsrc")
    sink.set_state(State.PLAYING)
    src.set_state(State.PLAYING)
    inbox = {"prod": [], "cons": []}

    prod_id, w1 = server.handle_connect()
    for m in sink.signalling_connect(w1[0][1]):
        server.handle_message(prod_id, m)
    cons_id, w2 = server.handle_connect()

    # prepare a media pad so the offer has an m-line
    vpad = sink.request_pad()
    feed = Pad("f", PadDirection.SRC,
               PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                           Caps.any()))
    feed.link(vpad)
    feed.push_event(StreamStartEvent("v"))
    feed.push_event(CapsEvent(parse_caps("audio/x-opus")))
    feed.push_event(SegmentEvent(Segment()))
    feed.push(Buffer(b"opus0", pts=0))

    # consumer announces + lists + starts the session; shuttle until
    # the exchange settles
    queue = [(cons_id, m)
             for m in src.signalling_connect(w2[0][1])]
    while queue:
        peer, msg = queue.pop(0)
        for to, fwd in server.handle_message(peer, msg):
            handler = sink if to == prod_id else src
            who = prod_id if to == prod_id else cons_id
            queue.extend((who, r)
                         for r in handler.handle_signalling(fwd))
    assert src.remote_sdp and "OPUS" in src.remote_sdp
    sid = src.session_id or next(iter(sink._sessions))

    # media: session pad -> consumer push_rtp -> src pad
    spad = sink.static_pad(f"session_{sid}")
    relay = Pad("r", PadDirection.SINK,
                PadTemplate("sink", PadDirection.SINK,
                            PadPresence.ALWAYS, Caps.any()))
    relay.chain_function = \
        lambda p, b: src.push_rtp(b.to_bytes(), b.pts)
    relay.event_function = lambda p, e: True
    spad.link(relay)
    out = []
    cap = Pad("c", PadDirection.SINK,
              PadTemplate("sink", PadDirection.SINK,
                          PadPresence.ALWAYS, Caps.any()))
    cap.chain_function = lambda p, b: (out.append(b), FlowReturn.OK)[1]
    cap.event_function = lambda p, e: True
    src.static_pad("src").link(cap)
    feed.push(Buffer(b"opus1", pts=20_000_000))
    assert out
    from gstpu.net.rtp.packet import RtpPacket
    assert RtpPacket.parse(out[0].to_bytes()).payload == b"opus1"
    sink.set_state(State.NULL)
    src.set_state(State.NULL)
