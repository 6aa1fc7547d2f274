"""VP8/VP9 RTP payloaders/depayloaders
(reference net/rtp/src/{vp8,vp9}; RFC 7741 + VP9 payload draft).
Frames fragment over MTU with begin/end markers; depayloaders
reassemble until the RTP marker bit.
"""

from __future__ import annotations

from gstpu.core.buffer import Buffer, BufferFlags
from gstpu.core.caps import Caps
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.registry import Rank, register_element
from gstpu.net.rtp.basepay import RtpBaseDepay2, RtpBasePay2, rtp_caps
from gstpu.net.rtp.packet import RtpPacket


def _tmpl(name, d, caps):
    return PadTemplate(name, d, PadPresence.ALWAYS, caps)


@register_element("rtpvp8pay2", Rank.SECONDARY)
class RtpVp8Pay(RtpBasePay2):
    PAD_TEMPLATES = [
        _tmpl("sink", PadDirection.SINK, Caps.new("video/x-vp8")),
        _tmpl("src", PadDirection.SRC,
              rtp_caps("VP8", clock_rate=90000, media="video")),
    ]

    def handle_buffer(self, buf: Buffer) -> None:
        data = buf.to_bytes()
        rtp_ts = self.rtp_timestamp_for(buf)
        max_payload = self.mtu - 12 - 1
        chunks = [data[i:i + max_payload]
                  for i in range(0, len(data), max_payload)] or [b""]
        for i, c in enumerate(chunks):
            # RFC 7741 minimal descriptor: S bit on the first fragment
            desc = bytes([0x10 if i == 0 else 0x00])
            self.queue_packet(desc + c, marker=(i == len(chunks) - 1),
                              rtp_ts=rtp_ts, pts=buf.pts)


@register_element("rtpvp8depay2", Rank.SECONDARY)
class RtpVp8Depay(RtpBaseDepay2):
    PAD_TEMPLATES = [
        _tmpl("sink", PadDirection.SINK, rtp_caps("VP8",
                                                  clock_rate=90000,
                                                  media="video")),
        _tmpl("src", PadDirection.SRC, Caps.new("video/x-vp8")),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        self._frags: list[bytes] = []
        self._frame_pts = None

    def depay_src_caps(self, incaps):
        return Caps.new("video/x-vp8")

    @staticmethod
    def _strip_descriptor(payload: bytes) -> bytes:
        if not payload:
            return b""
        off = 1
        b0 = payload[0]
        if b0 & 0x80:  # X: extended control bits
            x = payload[off]
            off += 1
            if x & 0x80:  # I: PictureID (1-2 bytes)
                off += 2 if payload[off] & 0x80 else 1
            if x & 0x40:  # L: TL0PICIDX
                off += 1
            if x & 0x30:  # T/K
                off += 1
        return payload[off:]

    def handle_packet(self, pkt: RtpPacket, buf: Buffer) -> None:
        payload = self._strip_descriptor(pkt.payload)
        if pkt.payload and (pkt.payload[0] & 0x10) and self._frags:
            self._frags = []  # new partition start: drop stale frags
        if not self._frags:
            self._frame_pts = self.pts_for(pkt)
        self._frags.append(payload)
        if pkt.marker:
            frame = b"".join(self._frags)
            self._frags = []
            out = Buffer(frame, pts=self._frame_pts)
            # VP8 keyframe: lowest bit of first byte == 0
            if frame and (frame[0] & 0x01):
                out.set_flag(BufferFlags.DELTA_UNIT)
            self.queue_buffer(out.data, pts=out.pts)
            if out.has_flag(BufferFlags.DELTA_UNIT):
                self._pending[-1].set_flag(BufferFlags.DELTA_UNIT)


@register_element("rtpvp9pay2", Rank.SECONDARY)
class RtpVp9Pay(RtpBasePay2):
    PAD_TEMPLATES = [
        _tmpl("sink", PadDirection.SINK, Caps.new("video/x-vp9")),
        _tmpl("src", PadDirection.SRC,
              rtp_caps("VP9", clock_rate=90000, media="video")),
    ]

    def handle_buffer(self, buf: Buffer) -> None:
        data = buf.to_bytes()
        rtp_ts = self.rtp_timestamp_for(buf)
        max_payload = self.mtu - 12 - 1
        chunks = [data[i:i + max_payload]
                  for i in range(0, len(data), max_payload)] or [b""]
        last = len(chunks) - 1
        for i, c in enumerate(chunks):
            # VP9 payload descriptor: B (bit 3) begin, E (bit 2) end
            desc = (0x08 if i == 0 else 0) | (0x04 if i == last else 0)
            if not buf.is_keyframe():
                desc |= 0x40  # P: inter-picture predicted
            self.queue_packet(bytes([desc]) + c, marker=(i == last),
                              rtp_ts=rtp_ts, pts=buf.pts)


@register_element("rtpvp9depay2", Rank.SECONDARY)
class RtpVp9Depay(RtpBaseDepay2):
    PAD_TEMPLATES = [
        _tmpl("sink", PadDirection.SINK, rtp_caps("VP9",
                                                  clock_rate=90000,
                                                  media="video")),
        _tmpl("src", PadDirection.SRC, Caps.new("video/x-vp9")),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        self._frags: list[bytes] = []
        self._frame_pts = None
        self._delta = False

    def depay_src_caps(self, incaps):
        return Caps.new("video/x-vp9")

    @staticmethod
    def _strip_descriptor(payload: bytes) -> tuple[bytes, int]:
        if not payload:
            return b"", 0
        b0 = payload[0]
        off = 1
        if b0 & 0x80:  # I: picture ID
            off += 2 if payload[off] & 0x80 else 1
        if b0 & 0x20:  # L: layer indices
            off += 1
            if not (b0 & 0x10):  # no F (flexible): TL0PICIDX present
                off += 1
        return payload[off:], b0

    def handle_packet(self, pkt: RtpPacket, buf: Buffer) -> None:
        payload, b0 = self._strip_descriptor(pkt.payload)
        if b0 & 0x08 and self._frags:
            self._frags = []
        if not self._frags:
            self._frame_pts = self.pts_for(pkt)
            self._delta = bool(b0 & 0x40)
        self._frags.append(payload)
        if pkt.marker or (b0 & 0x04):
            frame = b"".join(self._frags)
            self._frags = []
            self.queue_buffer(frame, pts=self._frame_pts)
            if self._delta:
                self._pending[-1].set_flag(BufferFlags.DELTA_UNIT)
