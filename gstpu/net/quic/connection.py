"""QUIC v1 connection (RFC 9000): packet spaces, frames, and the TLS
handshake driving key installation.

Sans-IO: handle_datagram(bytes) ingests, poll_transmit() drains
datagrams, events() yields ("stream", id, data, fin) /
("datagram", data) / ("connected",) / ("closed", code). Streams and
DATAGRAM frames (RFC 9221) are exposed for the quinn elements.
Loss recovery: sent ack-eliciting frames are kept until acked and
on_timeout() retransmits them (a PTO without RTT estimation —
RFC 9002's full machinery is ceded; the reference delegates it to
quinn-proto). Congestion control is out of scope.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from gstpu.net.quic import tls13
from gstpu.net.quic.packet import (PT_HANDSHAKE, PT_INITIAL,
                                   DirectionKeys, PlainPacket,
                                   QuicError, build_packet,
                                   decode_varint, encode_varint,
                                   initial_keys, unprotect_packet)

# frame types
F_PADDING = 0x00
F_PING = 0x01
F_ACK = 0x02
F_CRYPTO = 0x06
F_NEW_TOKEN = 0x07
F_STREAM_BASE = 0x08          # 0x08..0x0f
F_MAX_DATA = 0x10
F_MAX_STREAM_DATA = 0x11
F_CONNECTION_CLOSE = 0x1C
F_CONNECTION_CLOSE_APP = 0x1D
F_HANDSHAKE_DONE = 0x1E
F_DATAGRAM = 0x30             # 0x30 (no len) / 0x31 (with len)

_SPACES = (tls13.INITIAL, tls13.HANDSHAKE, tls13.APPLICATION)


@dataclass
class _Space:
    write: DirectionKeys | None = None
    read: DirectionKeys | None = None
    next_pn: int = 0
    largest_recv: int = -1
    pending: list[bytes] = field(default_factory=list)  # frames out
    # pn -> ack-eliciting frame bytes, for retransmit-on-timeout
    unacked: dict[int, bytes] = field(default_factory=dict)


def _keys_from_secret(secret: bytes) -> DirectionKeys:
    return DirectionKeys.from_secret(secret)


class QuicConnection:
    """One QUIC connection endpoint."""

    def __init__(self, *, client: bool, alpn: str = "gstpu-quic",
                 certificate=None,
                 remote_fingerprint: str | None = None):
        self.is_client = client
        self.local_cid = os.urandom(8)
        self.remote_cid = os.urandom(8)   # client: provisional DCID
        self.connected = False
        self.closed: int | None = None
        self.tls = tls13.Tls13Machine(
            client=client, alpn=alpn, certificate=certificate,
            remote_fingerprint=remote_fingerprint)
        self._spaces = {lvl: _Space() for lvl in _SPACES}
        self._events: list[tuple] = []
        self._outbox: list[bytes] = []
        self._streams_rx: dict[int, bytearray] = {}
        self._next_stream_id = 0 if client else 1
        self._handshake_done_sent = False
        if client:
            w, r = initial_keys(self.remote_cid, True)
            sp = self._spaces[tls13.INITIAL]
            sp.write, sp.read = w, r
            self._initial_dcid = self.remote_cid

    # -- public API -----------------------------------------------------
    def connect(self) -> None:
        assert self.is_client
        self.tls.start()
        self._pump_tls()
        self._flush()

    def events(self) -> list[tuple]:
        out, self._events = self._events, []
        return out

    def poll_transmit(self) -> bytes | None:
        if self._outbox:
            return self._outbox.pop(0)
        return None

    def open_stream(self) -> int:
        sid = self._next_stream_id
        self._next_stream_id += 4        # bidi, our side
        return sid

    def open_uni_stream(self) -> int:
        sid = getattr(self, "_next_uni_id",
                      2 if self.is_client else 3)
        self._next_uni_id = sid + 4
        return sid

    def send_stream(self, stream_id: int, data: bytes,
                    fin: bool = False) -> None:
        """Queue one STREAM frame (offset accumulates per stream)."""
        offs = getattr(self, "_tx_offsets", None)
        if offs is None:
            offs = self._tx_offsets = {}
        off = offs.get(stream_id, 0)
        ftype = F_STREAM_BASE | 0x04 | 0x02 | (0x01 if fin else 0)
        frame = (bytes([ftype]) + encode_varint(stream_id)
                 + encode_varint(off) + encode_varint(len(data))
                 + data)
        offs[stream_id] = off + len(data)
        self._spaces[tls13.APPLICATION].pending.append(frame)
        self._flush()

    def send_datagram(self, data: bytes) -> None:
        frame = bytes([F_DATAGRAM | 1]) + encode_varint(len(data)) \
            + data
        self._spaces[tls13.APPLICATION].pending.append(frame)
        self._flush()

    def close(self, code: int = 0) -> None:
        frame = (bytes([F_CONNECTION_CLOSE_APP]) + encode_varint(code)
                 + encode_varint(0))
        self._spaces[tls13.APPLICATION].pending.append(frame)
        self._flush()
        self.closed = code

    def on_timeout(self) -> None:
        """Probe timeout: retransmit every unacked ack-eliciting
        frame (RFC 9002's PTO, without RTT estimation — callers pick
        the interval). Safe to call any time; no-op when nothing is
        outstanding."""
        for level in _SPACES:
            sp = self._spaces[level]
            if not sp.unacked or sp.write is None:
                continue
            frames, sp.unacked = sp.unacked, {}
            for pn in sorted(frames):
                sp.pending.append(frames[pn])
        self._flush()

    # -- TLS plumbing ------------------------------------------------------
    def _pump_tls(self) -> None:
        for level, msg in self.tls.outputs:
            frame = (bytes([F_CRYPTO])
                     + encode_varint(self._crypto_off(level))
                     + encode_varint(len(msg)) + msg)
            self._bump_crypto_off(level, len(msg))
            self._spaces[level].pending.append(frame)
        self.tls.outputs = []
        self._install_keys()

    def _crypto_off(self, level: int) -> int:
        offs = getattr(self, "_crypto_offsets", None)
        if offs is None:
            offs = self._crypto_offsets = {lvl: 0 for lvl in _SPACES}
        return offs[level]

    def _bump_crypto_off(self, level: int, n: int) -> None:
        self._crypto_offsets[level] += n

    def _install_keys(self) -> None:
        if self.tls.hs_secrets is not None:
            sp = self._spaces[tls13.HANDSHAKE]
            if sp.write is None:
                c, s = self.tls.hs_secrets
                mine, theirs = (c, s) if self.is_client else (s, c)
                sp.write = _keys_from_secret(mine)
                sp.read = _keys_from_secret(theirs)
        if self.tls.ap_secrets is not None:
            sp = self._spaces[tls13.APPLICATION]
            if sp.write is None:
                c, s = self.tls.ap_secrets
                mine, theirs = (c, s) if self.is_client else (s, c)
                sp.write = _keys_from_secret(mine)
                sp.read = _keys_from_secret(theirs)
        if self.tls.complete and not self.connected:
            self.connected = True
            self._events.append(("connected",))
            if not self.is_client and not self._handshake_done_sent:
                self._handshake_done_sent = True
                self._spaces[tls13.APPLICATION].pending.append(
                    bytes([F_HANDSHAKE_DONE]))

    # -- receive ----------------------------------------------------------
    def handle_datagram(self, data: bytes) -> None:
        pos = 0
        while pos < len(data):
            chunk = data[pos:]
            if not chunk or chunk[0] == 0:
                break                       # padding tail
            try:
                consumed = self._handle_packet(chunk)
            except QuicError:
                if pos == 0:
                    raise
                break                       # bad coalesced tail: drop
            if consumed <= 0:
                break
            pos += consumed
        self._pump_tls()
        self._flush()

    def _handle_packet(self, data: bytes) -> int:
        if data[0] & 0x80:                  # long header
            ptype = (data[0] >> 4) & 0x3
            if ptype == PT_INITIAL:
                level = tls13.INITIAL
                if not self.is_client \
                        and self._spaces[level].read is None:
                    # derive initial keys from the client's DCID
                    _, _, _, _ = 0, 0, 0, 0
                    from gstpu.net.quic.packet import parse_long_header
                    _, dcid, scid, _ = parse_long_header(data)
                    w, r = initial_keys(dcid, False)
                    sp = self._spaces[level]
                    sp.write, sp.read = w, r
                    self.remote_cid = scid
            elif ptype == PT_HANDSHAKE:
                level = tls13.HANDSHAKE
            else:
                raise QuicError(f"unsupported packet type {ptype}")
            sp = self._spaces[level]
            if sp.read is None:
                raise QuicError("no read keys for level yet")
            pkt, consumed = unprotect_packet(data, 0, sp.read,
                                             is_long=True)
            if self.is_client and level == tls13.INITIAL:
                # adopt the server's chosen CID
                self.remote_cid = pkt.scid
        else:
            level = tls13.APPLICATION
            sp = self._spaces[level]
            if sp.read is None:
                raise QuicError("1-RTT packet before keys")
            pkt, consumed = unprotect_packet(
                data, 0, sp.read, is_long=False,
                dcid_len=len(self.local_cid))
        sp = self._spaces[level]
        sp.largest_recv = max(sp.largest_recv, pkt.pn)
        eliciting = self._handle_frames(level, pkt.payload)
        # only ack-eliciting packets get an ACK (RFC 9002 §2) — acking
        # pure-ACK packets would ping-pong forever
        if eliciting:
            sp.pending.append(self._ack_frame(sp))
        return consumed

    def _ack_frame(self, sp: _Space) -> bytes:
        largest = max(sp.largest_recv, 0)
        return (bytes([F_ACK]) + encode_varint(largest)
                + encode_varint(0)          # delay
                + encode_varint(0)          # range count
                + encode_varint(largest))   # first range

    def _deliver_stream(self, sid: int, off: int, data: bytes,
                        fin: bool) -> None:
        """Offset-ordered delivery: duplicates (e.g. from a spurious
        probe retransmission) are dropped, out-of-order segments are
        buffered until the gap fills."""
        st = self._streams_rx.setdefault(
            sid, {"next": 0, "ooo": {}, "fin_at": None})
        if fin:
            st["fin_at"] = off + len(data)
        end = off + len(data)
        if end <= st["next"] and not (fin and end == st["next"]):
            return                       # pure duplicate
        if off > st["next"]:
            if len(st["ooo"]) < 4096:    # bound: drop beyond window
                st["ooo"][off] = data    # hole before this segment
            return
        if off < st["next"]:             # partial overlap: trim
            data = data[st["next"] - off:]
        st["next"] = end if end > st["next"] else st["next"]
        emit_fin = st["fin_at"] == st["next"]
        if data or emit_fin:
            self._events.append(("stream", sid, data, emit_fin))
        # drain any now-contiguous buffered segments
        while st["ooo"]:
            nxt = st["ooo"].pop(st["next"], None)
            if nxt is None:
                # also allow overlapping buffered segments
                cand = [o for o in st["ooo"] if o < st["next"]]
                if not cand:
                    break
                o = cand[0]
                seg = st["ooo"].pop(o)
                nxt = seg[st["next"] - o:] \
                    if o + len(seg) > st["next"] else b""
            st["next"] += len(nxt)
            emit_fin = st["fin_at"] == st["next"]
            if nxt or emit_fin:
                self._events.append(("stream", sid, nxt, emit_fin))

    def _handle_frames(self, level: int, payload: bytes) -> bool:
        """Process frames; return True if any was ack-eliciting."""
        eliciting = False
        pos = 0
        while pos < len(payload):
            ftype = payload[pos]
            pos += 1
            if ftype == F_PADDING:
                continue
            if ftype == F_PING:
                eliciting = True
                continue
            if ftype in (F_ACK, F_ACK | 1):
                largest, pos = decode_varint(payload, pos)
                _, pos = decode_varint(payload, pos)   # delay
                nrange, pos = decode_varint(payload, pos)
                _, pos = decode_varint(payload, pos)   # first range
                for _ in range(nrange):
                    _, pos = decode_varint(payload, pos)
                    _, pos = decode_varint(payload, pos)
                sp = self._spaces[level]
                for pn in [p for p in sp.unacked if p <= largest]:
                    del sp.unacked[pn]
                continue
            if ftype == F_CRYPTO:
                eliciting = True
                off, pos = decode_varint(payload, pos)
                ln, pos = decode_varint(payload, pos)
                self.tls.feed(level, payload[pos:pos + ln])
                pos += ln
                continue
            if F_STREAM_BASE <= ftype <= 0x0F:
                eliciting = True
                sid, pos = decode_varint(payload, pos)
                off = 0
                if ftype & 0x04:
                    off, pos = decode_varint(payload, pos)
                if ftype & 0x02:
                    ln, pos = decode_varint(payload, pos)
                else:
                    ln = len(payload) - pos
                data = payload[pos:pos + ln]
                pos += ln
                fin = bool(ftype & 0x01)
                self._deliver_stream(sid, off, data, fin)
                continue
            if ftype in (F_DATAGRAM, F_DATAGRAM | 1):
                eliciting = True
                if ftype & 1:
                    ln, pos = decode_varint(payload, pos)
                else:
                    ln = len(payload) - pos
                self._events.append(("datagram",
                                     payload[pos:pos + ln]))
                pos += ln
                continue
            if ftype in (F_CONNECTION_CLOSE, F_CONNECTION_CLOSE_APP):
                code, pos = decode_varint(payload, pos)
                if ftype == F_CONNECTION_CLOSE:
                    _, pos = decode_varint(payload, pos)  # frame type
                rlen, pos = decode_varint(payload, pos)
                pos += rlen
                self.closed = code
                self._events.append(("closed", code))
                continue
            if ftype == F_HANDSHAKE_DONE:
                eliciting = True
                continue
            if ftype in (F_MAX_DATA, F_MAX_STREAM_DATA):
                eliciting = True
                _, pos = decode_varint(payload, pos)
                if ftype == F_MAX_STREAM_DATA:
                    _, pos = decode_varint(payload, pos)
                continue
            raise QuicError(f"unhandled frame type {ftype:#x}")
        return eliciting

    # -- send -------------------------------------------------------------
    def _flush(self) -> None:
        for level in _SPACES:
            sp = self._spaces[level]
            if not sp.pending or sp.write is None:
                continue
            payload = b"".join(sp.pending)
            # remember ack-eliciting frames for retransmit-on-timeout
            eliciting = b"".join(
                f for f in sp.pending
                if f and f[0] not in (F_PADDING, F_ACK, F_ACK | 1))
            sp.pending = []
            # AEAD sampling needs >= 4 bytes past the pn: pad tiny
            # payloads
            if len(payload) < 4:
                payload += bytes(4 - len(payload))
            if level == tls13.INITIAL:
                pkt = PlainPacket(True, PT_INITIAL, self.remote_cid,
                                  self.local_cid, sp.next_pn, payload)
            elif level == tls13.HANDSHAKE:
                pkt = PlainPacket(True, PT_HANDSHAKE, self.remote_cid,
                                  self.local_cid, sp.next_pn, payload)
            else:
                pkt = PlainPacket(False, -1, self.remote_cid, b"",
                                  sp.next_pn, payload)
            if eliciting:
                sp.unacked[sp.next_pn] = eliciting
                if len(sp.unacked) > 4096:      # bound the buffer
                    oldest = min(sp.unacked)
                    del sp.unacked[oldest]
            sp.next_pn += 1
            out = build_packet(pkt, sp.write)
            if self.is_client and level == tls13.INITIAL \
                    and len(out) < 1200:
                # RFC 9000 §14.1: client Initial datagrams are padded
                out += bytes(1200 - len(out))
            self._outbox.append(out)
