"""sodiumencrypter / sodiumdecrypter: whole-stream AEAD encryption.

Rebuilds the reference generic/sodium elements (libsodium
secretstream-style chunked encryption with typefind support). The
environment has no libsodium, so the stream format uses IETF
ChaCha20-Poly1305 (via `cryptography`) with the same structure: a
magic + 24-byte random stream header from which a per-stream subkey
is derived (HKDF — mirroring secretstream's header→subkey step), then
length-prefixed AEAD chunks with a counter nonce — chunk tampering,
truncation and reordering are all detected. Not wire-compatible with
libsodium's XChaCha20 secretstream (documented divergence).
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

MAGIC = b"gstpu-sodium-stream\x01"
ENC_CAPS = Caps.new("application/x-sodium-encrypted-stream")
HEADER_LEN = 24                 # random per-stream header (subkey salt)


def _aead(key: bytes):
    from cryptography.hazmat.primitives.ciphers.aead import \
        ChaCha20Poly1305
    if len(key) != 32:
        raise ValueError("key must be 32 bytes")
    return ChaCha20Poly1305(key)


def _stream_aead(key: bytes, header: bytes):
    """Per-stream subkey = HKDF-SHA256(key, salt=header).  Mirrors
    libsodium secretstream's 24-byte header → subkey derivation so a
    (key, counter) pair never repeats across streams or element
    restarts; nonce reuse would need a 24-byte header collision
    (birthday bound 2^96)."""
    if len(key) != 32:
        raise ValueError("key must be 32 bytes")
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.kdf.hkdf import HKDF
    sub = HKDF(algorithm=hashes.SHA256(), length=32, salt=header,
               info=MAGIC).derive(key)
    return _aead(sub)


def _nonce(counter: int) -> bytes:
    return b"\x00" * 4 + struct.pack(">Q", counter)


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
                     blurb="24-byte stream header / subkey salt "
                           "(random if unset)")

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
        import os
        self._prefix = self.nonce or os.urandom(HEADER_LEN)
        if len(self._prefix) != HEADER_LEN:
            self.post_error("sodiumencrypter: stream header must be "
                            f"{HEADER_LEN} bytes")
            return False
        try:
            self._aead = _stream_aead(self.key, self._prefix)
        except ValueError as e:
            self.post_error(f"sodiumencrypter: {e}")
            return False
        self._counter = 0
        self._header_sent = False
        return True

    def transform(self, buf: Buffer) -> Buffer:
        chunks = []
        if not self._header_sent:
            chunks.append(MAGIC + self._prefix)
            self._header_sent = True
        ct = self._aead.encrypt(_nonce(self._counter),
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
        if len(self.key) != 32:
            self.post_error("sodiumdecrypter: key must be 32 bytes")
            return False
        self._aead = None
        self._counter = 0
        self._prefix = None
        self._acc = bytearray()
        return True

    def transform(self, buf: Buffer) -> list[Buffer] | None:
        self._acc.extend(buf.to_bytes())
        out = []
        if self._prefix is None:
            need = len(MAGIC) + HEADER_LEN
            if len(self._acc) < need:
                return None
            if bytes(self._acc[:len(MAGIC)]) != MAGIC:
                self.post_error("sodiumdecrypter: bad stream magic")
                raise FlowError(FlowReturn.ERROR)
            self._prefix = bytes(self._acc[len(MAGIC):need])
            self._aead = _stream_aead(self.key, self._prefix)
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
                    _nonce(self._counter), ct, MAGIC)
            except InvalidTag:
                self.post_error("sodiumdecrypter: authentication failed "
                                f"at chunk {self._counter}")
                raise FlowError(FlowReturn.ERROR)
            self._counter += 1
            out.append(Buffer(pt))
        return out or None
