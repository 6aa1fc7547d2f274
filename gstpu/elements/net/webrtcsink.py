"""webrtcsink / webrtcsrc: producer/consumer shells over the sans-IO
signalling protocol.

Rebuilds the reference webrtcsink's control plane (net/webrtc/src/
webrtcsink: announce as producer, accept startSession, exchange SDP
through `peer` messages, payload media as RTP per consumer).  The
ICE/DTLS transport the reference gets from webrtcbin has no
counterpart in this zero-egress environment; instead each consumer
session exposes an RTP src pad (`session_%s`) the application routes
over its own transport (udpsink, intersink, quinnroq framing...) —
that boundary is the documented env gate in PARITY.md.
"""

from __future__ import annotations

from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import (Element, FlowReturn, Pad, PadDirection,
                                PadPresence, PadTemplate, State)
from gstpu.core.event import (CapsEvent, Event, Segment, SegmentEvent,
                              StreamStartEvent)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, make, register_element

_PAYLOADERS = {
    "video/x-vp8": ("rtpvp8pay2", "VP8"),
    "video/x-vp9": ("rtpvp9pay2", "VP9"),
    "audio/x-opus": ("rtpopuspay2", "OPUS"),
    "audio/x-alaw": ("rtppcmapay2", "PCMA"),
    "audio/x-mulaw": ("rtppcmupay2", "PCMU"),
}


@register_element("webrtcsink", Rank.NONE)
class WebRtcSink(Element):
    """Producer side: media sink pads -> per-consumer RTP src pads +
    the signalling session lifecycle."""

    PAD_TEMPLATES = [
        PadTemplate("sink_%u", PadDirection.SINK, PadPresence.REQUEST,
                    # encoded media the payloaders accept
                    Caps([s for n in _PAYLOADERS
                          for s in Caps.new(n)])),
        PadTemplate("session_%s", PadDirection.SRC,
                    PadPresence.SOMETIMES,
                    Caps.new("application/x-rtp")),
    ]

    display_name = Property(str, default="gstpu-webrtcsink",
                            mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self.peer_id: str | None = None
        self._payloaders: dict[str, Element] = {}   # sink pad -> pay
        self._sessions: dict[str, Pad] = {}         # session -> src
        self._outbox: list[dict] = []

    # -- signalling (sans-IO: the app shuttles dicts) --------------------
    def signalling_connect(self, welcome_msg: dict) -> list[dict]:
        """Feed the server's welcome; returns messages to send."""
        self.peer_id = welcome_msg["peerId"]
        return [{"type": "setPeerStatus", "roles": ["producer"],
                 "meta": {"name": self.display_name}}]

    def handle_signalling(self, msg: dict) -> list[dict]:
        t = msg.get("type")
        if t == "startSession":
            sid = msg["sessionId"]
            pad = Pad(f"session_{sid}", PadDirection.SRC,
                      self.PAD_TEMPLATES[1], self)
            self.add_pad(pad)
            pad.push_event(StreamStartEvent(f"{self.name}/{sid}"))
            pad.push_event(CapsEvent(Caps.new("application/x-rtp")))
            pad.push_event(SegmentEvent(Segment()))
            self._sessions[sid] = pad
            self.post_element_message("consumer-added", session=sid,
                                      peer=msg.get("peerId"))
            return [{"type": "peer", "sessionId": sid,
                     "sdp": {"type": "offer",
                             "sdp": self._offer_sdp()}}]
        if t == "peer" and "sdp" in msg:
            return []                       # answer accepted
        if t == "endSession":
            sid = msg.get("sessionId")
            pad = self._sessions.pop(sid, None)
            if pad is not None:
                self.remove_pad(pad)
            self.post_element_message("consumer-removed", session=sid)
            return []
        return []

    def _offer_sdp(self) -> str:
        lines = ["v=0", f"o=- 0 0 IN IP4 127.0.0.1",
                 f"s={self.display_name}", "t=0 0"]
        for pad_name, pay in self._payloaders.items():
            enc = pay._gstpu_encoding
            kind = "audio" if enc in ("OPUS", "PCMA", "PCMU") \
                else "video"
            pt = pay.pt
            rate = pay.clock_rate or 90000
            lines.append(f"m={kind} 9 UDP/TLS/RTP/SAVPF {pt}")
            lines.append(f"a=rtpmap:{pt} {enc}/{rate}")
            lines.append("a=sendonly")
        return "\r\n".join(lines) + "\r\n"

    # -- media -------------------------------------------------------------
    def request_pad(self, name: str | None = None) -> Pad:
        pad = super().request_pad(name)
        pad.chain_function = self._chain
        pad.event_function = self._event
        return pad

    def _payloader_for(self, pad: Pad) -> Element:
        pay = self._payloaders.get(pad.name)
        if pay is None:
            caps_name = pad.caps()[0].name
            factory, enc = _PAYLOADERS[caps_name]
            pay = make(factory)
            pay._gstpu_encoding = enc
            pay.set_state(State.PLAYING)
            feed = Pad("f", PadDirection.SRC,
                       PadTemplate("src", PadDirection.SRC,
                                   PadPresence.ALWAYS, Caps.any()))
            feed.link(pay.static_pad("sink"))
            cap = Pad("c", PadDirection.SINK,
                      PadTemplate("sink", PadDirection.SINK,
                                  PadPresence.ALWAYS, Caps.any()))
            cap.chain_function = self._fanout
            cap.event_function = lambda p, e: True
            pay.static_pad("src").link(cap)
            pay._gstpu_feed = feed
            feed.push_event(StreamStartEvent(pad.name))
            feed.push_event(CapsEvent(pad.caps().copy()))
            feed.push_event(SegmentEvent(Segment()))
            self._payloaders[pad.name] = pay
        return pay

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        pay = self._payloader_for(pad)
        return pay._gstpu_feed.push(buf)

    def _event(self, pad: Pad, ev: Event) -> bool:
        return True

    def _fanout(self, pad: Pad, buf: Buffer) -> FlowReturn:
        ret = FlowReturn.OK
        for spad in self._sessions.values():
            if spad.is_linked():
                ret = spad.push(buf.copy())
        return ret


_SRTP_CAPS = Caps.new("application/x-srtp")


class _SrtpBase(Element):
    key = Property(str, default=None, mutable=Mutability.READY,
                   blurb="hex master key (16B) + salt (14B) = 60 hex "
                         "chars, like srtpenc's key property")

    def _ctx(self):
        from gstpu.net.srtp import SrtpContext
        if not self.key or len(self.key) != 60:
            raise ValueError("webrtc send/recv needs a 60-hex-char "
                             "master key+salt (DTLS-SRTP handshake "
                             "is env-gated; keys are injected)")
        raw = bytes.fromhex(self.key)
        return SrtpContext(raw[:16], raw[16:])


@register_element("webrtcsend", Rank.NONE)
class WebRtcSend(_SrtpBase):
    """RTP in -> SRTP out (reference webrtcbin2 webrtcsend's
    srtpenc stage; AES-128-CM + HMAC-SHA1-80 per RFC 3711)."""

    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    Caps.new("application/x-rtp")),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    _SRTP_CAPS.copy()),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        self.sinkpad = self.static_pad("sink")
        self.srcpad = self.static_pad("src")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = \
            lambda p, e: self.srcpad.push_event(e)
        self._context = None

    def start(self) -> bool:
        try:
            self._context = self._ctx()
        except ValueError as e:
            self.post_error(str(e))
            return False
        return True

    def _chain(self, pad, buf) -> FlowReturn:
        return self.srcpad.push(
            Buffer(self._context.protect(buf.to_bytes()),
                   pts=buf.pts, duration=buf.duration))


@register_element("webrtcrecv", Rank.NONE)
class WebRtcRecv(_SrtpBase):
    """SRTP in -> RTP out; authentication failures drop the packet
    and post a message (srtpdec behavior)."""

    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    _SRTP_CAPS.copy()),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps.new("application/x-rtp")),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        self.sinkpad = self.static_pad("sink")
        self.srcpad = self.static_pad("src")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = \
            lambda p, e: self.srcpad.push_event(e)
        self._context = None
        self.stats = {"auth_failures": 0}

    def start(self) -> bool:
        try:
            self._context = self._ctx()
        except ValueError as e:
            self.post_error(str(e))
            return False
        return True

    def _chain(self, pad, buf) -> FlowReturn:
        try:
            rtp = self._context.unprotect(buf.to_bytes())
        except ValueError:
            self.stats["auth_failures"] += 1
            self.post_element_message("srtp-auth-failure")
            return FlowReturn.OK
        return self.srcpad.push(Buffer(rtp, pts=buf.pts,
                                       duration=buf.duration))


@register_element("whipclientsink", Rank.NONE)
class WhipClientSink(Element):
    """WHIP publisher shell (reference net/webrtc whipclientsink /
    whipsink): RTP in, WHIP HTTP session out.  The element drives a
    sans-IO WhipClientSession — the application shuttles its
    HttpRequest/HttpResponse records (no sockets here) and routes the
    `rtp` src pad over its transport once the resource is active."""

    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    Caps.new("application/x-rtp")),
        PadTemplate("rtp", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps.new("application/x-rtp")),
    ]

    whip_endpoint = Property(str, default=None,
                             mutable=Mutability.READY)
    auth_token = Property(str, default=None, mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self.session = None
        self.sinkpad = self.static_pad("sink")
        self.rtppad = self.static_pad("rtp")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = \
            lambda p, e: self.rtppad.push_event(e)

    def start(self) -> bool:
        from gstpu.net.webrtc.whip import WhipClientSession
        if not self.whip_endpoint:
            self.post_error("whipclientsink: no whip-endpoint")
            return False
        self.session = WhipClientSession(self.whip_endpoint,
                                         self.auth_token)
        return True

    def post_offer(self, sdp: str):
        return self.session.post_offer(sdp)

    def handle_response(self, resp):
        req = self.session.handle_response(resp)
        if self.session.state == "active":
            self.post_element_message(
                "whip-active", resource=self.session.resource_url)
        return req

    def _chain(self, pad, buf) -> FlowReturn:
        if self.session is None or self.session.state != "active":
            return FlowReturn.OK            # drop until resource up
        return self.rtppad.push(buf)


@register_element("whipserversrc", Rank.NONE)
class WhipServerSrc(Element):
    """WHIP ingest shell (reference whipserversrc): terminates the
    WHIP HTTP endpoint sans-IO and exposes one RTP sink-side feeder
    pad per session (`session_%s` SRC pads carry the media the app
    receives for that resource and injects via push_rtp)."""

    PAD_TEMPLATES = [
        PadTemplate("session_%s", PadDirection.SRC,
                    PadPresence.SOMETIMES,
                    Caps.new("application/x-rtp")),
    ]

    answer_sdp = Property(str, default="v=0\r\ns=gstpu\r\n",
                          mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        from gstpu.net.webrtc.whip import WhipServer
        self.server = WhipServer(self._answer)
        self._pads: dict[str, Pad] = {}

    def _answer(self, sid: str, offer: str) -> str:
        pad = Pad(f"session_{sid}", PadDirection.SRC,
                  self.PAD_TEMPLATES[0], self)
        self.add_pad(pad)
        pad.push_event(StreamStartEvent(f"{self.name}/{sid}"))
        pad.push_event(CapsEvent(Caps.new("application/x-rtp")))
        pad.push_event(SegmentEvent(Segment()))
        self._pads[sid] = pad
        self.post_element_message("whip-session", session=sid)
        return self.answer_sdp

    def handle_request(self, req):
        resp = self.server.handle_request(req)
        # DELETE tears the pad down
        for sid in list(self._pads):
            if sid not in self.server.sessions:
                self.remove_pad(self._pads.pop(sid))
        return resp

    def push_rtp(self, sid: str, data: bytes,
                 pts: int | None = None) -> FlowReturn:
        pad = self._pads.get(sid)
        if pad is None or not pad.is_linked():
            return FlowReturn.OK
        return pad.push(Buffer(data, pts=pts))


@register_element("whepserversink", Rank.NONE)
class WhepServerSink(WhipServerSrc):
    """WHEP egress shell: same endpoint machinery with the media
    direction reversed — buffers chained in fan out to every active
    session pad (the reference whepserversink serves consumers)."""

    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    Caps.new("application/x-rtp")),
        PadTemplate("session_%s", PadDirection.SRC,
                    PadPresence.SOMETIMES,
                    Caps.new("application/x-rtp")),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        from gstpu.net.webrtc.whip import WhepServer
        self.server = WhepServer(self._answer)
        self.sinkpad = self.static_pad("sink")
        self.sinkpad.chain_function = self._chain
        self.sinkpad.event_function = lambda p, e: True

    def _chain(self, pad, buf) -> FlowReturn:
        for spad in self._pads.values():
            if spad.is_linked():
                spad.push(buf.copy())
        return FlowReturn.OK


@register_element("whepclientsrc", Rank.NONE)
class WhepClientSrc(Element):
    """WHEP consumer shell (reference whepclientsrc/whepsrc): drives
    a WhepClientSession; received media is injected via push_rtp and
    emerges on the always src pad."""

    PAD_TEMPLATES = [
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps.new("application/x-rtp")),
    ]

    whep_endpoint = Property(str, default=None,
                             mutable=Mutability.READY)
    auth_token = Property(str, default=None, mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self.session = None
        self.srcpad = self.static_pad("src")
        self._started = False

    def start(self) -> bool:
        from gstpu.net.webrtc.whip import WhepClientSession
        if not self.whep_endpoint:
            self.post_error("whepclientsrc: no whep-endpoint")
            return False
        self.session = WhepClientSession(self.whep_endpoint,
                                         self.auth_token)
        return True

    def post_offer(self, sdp: str):
        return self.session.post_offer(sdp)

    def handle_response(self, resp):
        return self.session.handle_response(resp)

    def push_rtp(self, data: bytes,
                 pts: int | None = None) -> FlowReturn:
        if not self._started:
            self.srcpad.push_event(StreamStartEvent(self.name))
            self.srcpad.push_event(
                CapsEvent(Caps.new("application/x-rtp")))
            self.srcpad.push_event(SegmentEvent(Segment()))
            self._started = True
        return self.srcpad.push(Buffer(data, pts=pts))


# reference short names
from gstpu.core.registry import _registry as _R
for _short, _long in (("whipsink", "whipclientsink"),
                      ("whepsrc", "whepclientsrc")):
    if _short not in _R:
        _cls, _rank = _R[_long]
        register_element(_short, _rank)(
            type(_cls.__name__ + "Alias", (_cls,), {}))


@register_element("webrtcsrc", Rank.NONE)
class WebRtcSrc(Element):
    """Consumer side (reference webrtcsrc): lists producers, starts a
    session, accepts the producer's SDP offer and answers; the media
    plane (injected via push_rtp once the app's transport delivers
    it) surfaces on the always src pad."""

    PAD_TEMPLATES = [
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps.new("application/x-rtp")),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        self.peer_id: str | None = None
        self.session_id: str | None = None
        self.remote_sdp: str | None = None
        self.srcpad = self.static_pad("src")
        self._started = False

    def signalling_connect(self, welcome_msg: dict) -> list[dict]:
        self.peer_id = welcome_msg["peerId"]
        return [{"type": "setPeerStatus", "roles": ["listener"]},
                {"type": "list"}]

    def handle_signalling(self, msg: dict) -> list[dict]:
        t = msg.get("type")
        if t == "list":
            producers = msg.get("producers", [])
            if not producers:
                return []
            return [{"type": "startSession",
                     "peerId": producers[0]["id"]}]
        if t == "sessionStarted":
            self.session_id = msg.get("sessionId")
            return []
        if t == "peer" and "sdp" in msg:
            self.remote_sdp = msg["sdp"]["sdp"]
            self.post_element_message("offer-received",
                                      session=msg.get("sessionId"))
            return [{"type": "peer",
                     "sessionId": msg.get("sessionId"),
                     "sdp": {"type": "answer",
                             "sdp": self.remote_sdp.replace(
                                 "sendonly", "recvonly")}}]
        return []

    def push_rtp(self, data: bytes,
                 pts: int | None = None) -> FlowReturn:
        if not self._started:
            self.srcpad.push_event(StreamStartEvent(self.name))
            self.srcpad.push_event(
                CapsEvent(Caps.new("application/x-rtp")))
            self.srcpad.push_event(SegmentEvent(Segment()))
            self._started = True
        return self.srcpad.push(Buffer(data, pts=pts))
