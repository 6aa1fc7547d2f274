"""cea608tocea708: wrap CEA-608 pairs into CEA-708 cc_data or CDP.

Rebuilds the reference cea608tocea708 (video/closedcaption/src/
cea608tocea708/imp.rs: sink closedcaption/x-cea-608 format=raw or
s334-1a, src closedcaption/x-cea-708 format=cc_data).  This element
additionally negotiates format=cdp on the src side, producing full
SMPTE 334-2 CDP packets (sequence counter + checksum) sized to the
frame rate — the form mccenc and cea708mux consume.
"""

from __future__ import annotations

from fractions import Fraction

from gstpu.codecs.cea708 import (CC_COUNT, CDP_RATES, Cdp, build_cdp,
                                 cc_data_from_608, pad_cc_data)
from gstpu.core.base import BaseTransform
from gstpu.core.buffer import Buffer
from gstpu.core.caps import AnyList, Caps, Structure
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.registry import Rank, register_element

C608_CAPS = Caps([Structure("closedcaption/x-cea-608",
                            format=AnyList(("raw", "s334-1a")))])
C708_CAPS = Caps([Structure("closedcaption/x-cea-708",
                            format=AnyList(("cc_data", "cdp")))])


@register_element("cea608tocea708", Rank.NONE)
class Cea608ToCea708(BaseTransform):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    C608_CAPS.copy()),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    C708_CAPS.copy()),
    ]

    def __init__(self, name=None):
        super().__init__(name)
        self._s334 = False
        self._cdp = False
        self._rate_code = 0x4
        self._seq = 0

    def transform_caps(self, direction, caps, filter):
        out = (C708_CAPS if direction is PadDirection.SINK
               else C608_CAPS).copy()
        if filter is not None:
            out = filter.intersect(out)
        return out

    def set_caps(self, incaps, outcaps) -> bool:
        self._s334 = incaps[0].get("format") == "s334-1a"
        self._cdp = outcaps[0].get("format") == "cdp"
        fr = incaps[0].get("framerate")
        if fr is not None:
            self._rate_code = CDP_RATES.get(Fraction(fr), 0x4)
        return True

    def _pairs(self, data: bytes) -> list[tuple[int, bytes]]:
        """(field, pair) tuples; s334-1a carries a field byte per pair
        (imp.rs:514), raw is all field 0."""
        out = []
        if self._s334:
            for i in range(0, len(data) - 2, 3):
                field = 0 if data[i] & 0x80 else 1
                out.append((field, data[i + 1:i + 3]))
        else:
            for i in range(0, len(data) - 1, 2):
                out.append((0, data[i:i + 2]))
        return out

    def transform(self, buf: Buffer) -> Buffer:
        cc = b"".join(cc_data_from_608([p], field_=f)
                      for f, p in self._pairs(buf.to_bytes()))
        if self._cdp:
            cc = pad_cc_data(cc, CC_COUNT[self._rate_code])
            out = build_cdp(Cdp(rate_code=self._rate_code,
                                sequence=self._seq, cc_data=cc))
            self._seq = (self._seq + 1) & 0xFFFF
        else:
            out = cc
        return Buffer(out, pts=buf.pts, duration=buf.duration)


CDP_ONLY = Caps.new("closedcaption/x-cea-708", format="cdp")


@register_element("cdpserviceinject", Rank.NONE)
class CdpServiceInject(BaseTransform):
    """Injects caption service descriptors into CDP packets
    (reference video/closedcaption/src/cdpserviceinject/imp.rs:123:
    positive service numbers are CEA-708 services with easy-reader /
    wide-aspect-ratio flags, -1..-4 select CEA-608 channels CC1-CC4;
    languages are 3-letter ISO 639.2/B codes)."""

    IN_PLACE = False
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    CDP_ONLY.copy()),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    CDP_ONLY.copy()),
    ]

    from gstpu.core.props import Mutability, Property
    services = Property(object, default=None,
                        mutable=Mutability.PLAYING,
                        blurb="list of dicts: service, language, "
                              "easy_reader, wide_aspect_ratio")

    def transform(self, buf):
        from gstpu.codecs.cea708 import build_cdp, parse_cdp
        if not self.services:
            return buf
        cdp = parse_cdp(buf.to_bytes())
        cdp.services = list(self.services)
        return Buffer(build_cdp(cdp), pts=buf.pts,
                      duration=buf.duration)
