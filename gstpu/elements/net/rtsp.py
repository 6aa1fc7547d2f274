"""rtspsrc2: RTSP 1.0 client source (TCP-interleaved or UDP
transport).

Rebuilds the reference's RTSP client rewrite (net/rtsp rtspsrc2)
control-protocol core: OPTIONS/DESCRIBE (SDP parse) /SETUP/PLAY over
one TCP connection with RTP delivered as RFC 2326 §10.12 interleaved
frames ('$' channel len payload), pushed as application/x-rtp buffers.
UDP transport and seeking are round-2 items; the protocol state
machine and SDP track selection live here.
"""

from __future__ import annotations

import socket
from urllib.parse import urlparse

from gstpu.core.base import PushSrc
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps, Structure
from gstpu.core.element import (FlowError, FlowReturn, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element


def parse_sdp_media(sdp: str) -> list[dict]:
    """Extract media sections: kind, payload type, encoding, control."""
    out = []
    cur: dict | None = None
    for line in sdp.splitlines():
        line = line.strip()
        if line.startswith("m="):
            parts = line[2:].split()
            cur = {"kind": parts[0], "payload": int(parts[3])
                   if len(parts) > 3 else 96, "control": "",
                   "encoding": "", "clock-rate": 90000}
            out.append(cur)
        elif cur is not None and line.startswith("a=rtpmap:"):
            _, enc = line.split(":", 1)[1].split(" ", 1)
            name, _, rest = enc.partition("/")
            cur["encoding"] = name
            if rest:
                cur["clock-rate"] = int(rest.split("/")[0])
        elif cur is not None and line.startswith("a=control:"):
            cur["control"] = line.split(":", 1)[1]
    return out


class RtspConnection:
    """Blocking RTSP control connection + interleaved data demux."""

    def __init__(self, url: str, timeout: float = 5.0):
        self.url = url
        u = urlparse(url)
        self.sock = socket.create_connection(
            (u.hostname, u.port or 554), timeout=timeout)
        self._cseq = 0
        self._buf = b""
        self.session: str | None = None

    def request(self, method: str, url: str | None = None,
                headers: dict | None = None) -> tuple[int, dict, bytes]:
        self._cseq += 1
        lines = [f"{method} {url or self.url} RTSP/1.0",
                 f"CSeq: {self._cseq}"]
        if self.session:
            lines.append(f"Session: {self.session}")
        for k, v in (headers or {}).items():
            lines.append(f"{k}: {v}")
        self.sock.sendall(("\r\n".join(lines) + "\r\n\r\n").encode())
        return self._read_response()

    def _fill(self) -> None:
        chunk = self.sock.recv(65536)
        if not chunk:
            raise ConnectionError("RTSP connection closed")
        self._buf += chunk

    def _read_response(self) -> tuple[int, dict, bytes]:
        # responses may be interleaved with data frames; skip data
        while True:
            if self._buf[:1] == b"$":
                self._skip_data_frame()
                continue
            if b"\r\n\r\n" in self._buf:
                break
            self._fill()
        head, self._buf = self._buf.split(b"\r\n\r\n", 1)
        lines = head.decode("latin1").split("\r\n")
        status = int(lines[0].split()[1])
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        body = b""
        n = int(headers.get("content-length", 0))
        while len(self._buf) < n:
            self._fill()
        body, self._buf = self._buf[:n], self._buf[n:]
        if "session" in headers:
            self.session = headers["session"].split(";")[0]
        return status, headers, body

    def _skip_data_frame(self) -> None:
        while len(self._buf) < 4:
            self._fill()
        n = int.from_bytes(self._buf[2:4], "big")
        while len(self._buf) < 4 + n:
            self._fill()
        self._buf = self._buf[4 + n:]

    def read_data_frame(self, blocking: bool) -> tuple[int, bytes] | None:
        """Next interleaved frame (channel, payload), or None."""
        while True:
            if len(self._buf) >= 4 and self._buf[:1] == b"$":
                ch = self._buf[1]
                n = int.from_bytes(self._buf[2:4], "big")
                if len(self._buf) >= 4 + n:
                    payload = self._buf[4:4 + n]
                    self._buf = self._buf[4 + n:]
                    return ch, payload
            elif self._buf and self._buf[:1] != b"$":
                # unexpected control data mid-stream: drop a byte
                self._buf = self._buf[1:]
                continue
            if not blocking:
                try:
                    self.sock.setblocking(False)
                    self._fill()
                except (BlockingIOError, ConnectionError):
                    return None
                finally:
                    self.sock.setblocking(True)
            else:
                self._fill()

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


@register_element("rtspsrc2", Rank.PRIMARY)
class RtspSrc(PushSrc):
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC,
                                 PadPresence.ALWAYS,
                                 Caps.new("application/x-rtp"))]

    location = Property(str, default=None, mutable=Mutability.READY,
                        blurb="rtsp:// URL")
    timeout_s = Property(float, default=5.0, minimum=0.1)
    protocols = Property(str, default="tcp", mutable=Mutability.READY,
                         enum_values=("tcp", "udp"),
                         blurb="Transport: tcp (interleaved) or udp "
                               "(RTP/AVP with client_port)")

    def __init__(self, name=None):
        super().__init__(name)
        self._conn: RtspConnection | None = None
        self._media: dict | None = None
        self._rtp_sock = None
        self._rtcp_sock = None
        self.is_live = True

    def start(self) -> bool:
        if not self.location:
            self.post_error("rtspsrc2: no location")
            return False
        try:
            c = RtspConnection(self.location, self.timeout_s)
            status, _, _ = c.request("OPTIONS")
            if status != 200:
                raise ConnectionError(f"OPTIONS -> {status}")
            status, hdrs, body = c.request(
                "DESCRIBE", headers={"Accept": "application/sdp"})
            if status != 200:
                raise ConnectionError(f"DESCRIBE -> {status}")
            media = parse_sdp_media(body.decode())
            if not media:
                raise ConnectionError("no media in SDP")
            self._media = media[0]
            control = self._media["control"] or self.location
            if not control.startswith("rtsp"):
                control = self.location.rstrip("/") + "/" + control
            if self.protocols == "udp":
                import socket as _socket
                self._rtp_sock = _socket.socket(_socket.AF_INET,
                                                _socket.SOCK_DGRAM)
                self._rtp_sock.bind(("127.0.0.1", 0))
                self._rtp_sock.setblocking(False)
                self._rtcp_sock = _socket.socket(_socket.AF_INET,
                                                 _socket.SOCK_DGRAM)
                self._rtcp_sock.bind(("127.0.0.1", 0))
                self._rtcp_sock.setblocking(False)
                rtp_port = self._rtp_sock.getsockname()[1]
                rtcp_port = self._rtcp_sock.getsockname()[1]
                transport = (f"RTP/AVP;unicast;client_port="
                             f"{rtp_port}-{rtcp_port}")
            else:
                transport = "RTP/AVP/TCP;unicast;interleaved=0-1"
            status, _, _ = c.request(
                "SETUP", url=control,
                headers={"Transport": transport})
            if status != 200:
                raise ConnectionError(f"SETUP -> {status}")
            status, _, _ = c.request("PLAY")
            if status != 200:
                raise ConnectionError(f"PLAY -> {status}")
            self._conn = c
            return True
        except (OSError, ConnectionError) as e:
            self.post_error(f"rtspsrc2: {e}")
            return False

    def stop(self) -> bool:
        for sock in (self._rtp_sock, self._rtcp_sock):
            if sock is not None:
                sock.close()
        self._rtp_sock = self._rtcp_sock = None
        if self._conn:
            try:
                self._conn.request("TEARDOWN")
            except (OSError, ConnectionError):
                pass
            self._conn.close()
            self._conn = None
        return True

    def negotiate(self) -> Caps:
        m = self._media or {}
        s = Structure("application/x-rtp",
                      media=m.get("kind", "video"),
                      payload=m.get("payload", 96))
        if m.get("encoding"):
            s["encoding-name"] = m["encoding"]
        s["clock-rate"] = m.get("clock-rate", 90000)
        return Caps([s])

    def create(self) -> Buffer | None:
        if self._rtp_sock is not None:
            try:
                payload, _addr = self._rtp_sock.recvfrom(65536)
            except BlockingIOError:
                raise FlowError(FlowReturn.FLUSHING, "no datagram yet")
            buf = Buffer(payload)
            if self.clock is not None:
                buf.pts = self.running_time()
            return buf
        try:
            frame = self._conn.read_data_frame(blocking=False)
        except ConnectionError:
            return None  # EOS
        if frame is None:
            raise FlowError(FlowReturn.FLUSHING, "no frame yet")
        ch, payload = frame
        if ch != 0:   # RTCP channel: consumed, not forwarded (yet)
            raise FlowError(FlowReturn.FLUSHING, "rtcp frame")
        buf = Buffer(payload)
        if self.clock is not None:
            buf.pts = self.running_time()
        return buf
