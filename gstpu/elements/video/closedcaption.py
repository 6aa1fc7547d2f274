"""tttocea608 / cea608tott / ccdetect: closed-caption elements.

The first slice of the reference's closedcaption stack
(video/closedcaption: tttocea608, cea608tott, ccdetect) built on
gstpu.codecs.cea608. Caps: closedcaption/x-cea-608, format=raw, one
2-byte pair per buffer (field rate pacing handled by pts spacing).
"""

from __future__ import annotations

from gstpu.core.base import BaseTransform
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import (PadDirection, PadPresence, PadTemplate)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.codecs.cea608 import Cea608Decoder, Cea608Encoder

SECOND = 1_000_000_000

CC_CAPS = Caps.new("closedcaption/x-cea-608", format="raw")
TEXT_CAPS = Caps.new("text/x-raw", format="utf8")


def _tmpl(name, d, caps):
    return PadTemplate(name, d, PadPresence.ALWAYS, caps.copy())


@register_element("tttocea608", Rank.NONE)
class TtToCea608(BaseTransform):
    """Timed text -> CEA-608 pop-on byte pairs
    (reference video/closedcaption tttocea608)."""

    PAD_TEMPLATES = [_tmpl("sink", PadDirection.SINK, TEXT_CAPS),
                     _tmpl("src", PadDirection.SRC, CC_CAPS)]

    framerate_num = Property(int, default=30, minimum=1,
                             mutable=Mutability.READY)
    mode = Property(str, default="pop-on", mutable=Mutability.READY,
                    enum_values=("pop-on", "roll-up2", "roll-up3",
                                 "roll-up4"),
                    blurb="Caption mode (reference tttocea608 mode)")

    def __init__(self, name=None):
        super().__init__(name)
        self._enc = Cea608Encoder()

    def transform_caps(self, direction, caps, filter):
        out = (CC_CAPS if direction is PadDirection.SINK
               else TEXT_CAPS).copy()
        if filter is not None:
            out = filter.intersect(out)
        return out

    def transform(self, buf: Buffer) -> list[Buffer]:
        text = buf.to_bytes().decode("utf-8")
        if self.mode.startswith("roll-up"):
            pairs = self._enc.encode_rollup(text,
                                            rows=int(self.mode[-1]))
        else:
            pairs = self._enc.encode_popon(text)
        field_dur = SECOND // (self.framerate_num or 30)
        base = buf.pts if buf.pts is not None else 0
        out = []
        for i, pair in enumerate(pairs):
            out.append(Buffer(pair, pts=base + i * field_dur,
                              duration=field_dur))
        return out


@register_element("cea608tott", Rank.NONE)
class Cea608ToTt(BaseTransform):
    """CEA-608 byte pairs -> timed text
    (reference video/closedcaption cea608tott)."""

    PAD_TEMPLATES = [_tmpl("sink", PadDirection.SINK, CC_CAPS),
                     _tmpl("src", PadDirection.SRC, TEXT_CAPS)]

    def __init__(self, name=None):
        super().__init__(name)
        self._dec = Cea608Decoder()

    def transform_caps(self, direction, caps, filter):
        out = (TEXT_CAPS if direction is PadDirection.SINK
               else CC_CAPS).copy()
        if filter is not None:
            out = filter.intersect(out)
        return out

    def transform(self, buf: Buffer) -> Buffer | None:
        text = self._dec.push_pair(buf.to_bytes())
        if text is None:
            return None
        return Buffer(text.encode("utf-8"), pts=buf.pts)

    def flush(self) -> None:
        self._dec = Cea608Decoder()


@register_element("ccdetect", Rank.NONE)
class CcDetect(BaseTransform):
    """Passthrough detector posting cc608/cc708 presence changes
    (reference video/closedcaption ccdetect)."""

    IN_PLACE = True
    PAD_TEMPLATES = [_tmpl("sink", PadDirection.SINK, CC_CAPS),
                     _tmpl("src", PadDirection.SRC, CC_CAPS)]

    window = Property(int, default=10 * SECOND, minimum=0,
                      mutable=Mutability.PLAYING,
                      blurb="Silence window before cc considered absent")

    def __init__(self, name=None):
        super().__init__(name)
        self._present = None
        self._last_active_pts = None

    def transform_ip(self, buf: Buffer) -> None:
        from gstpu.codecs.cea608 import strip_parity
        data = buf.to_bytes()
        active = len(data) >= 2 and any(
            (strip_parity(b) or 0) >= 0x10 for b in data[:2])
        if active:
            self._last_active_pts = buf.pts
        present = active or (
            self._last_active_pts is not None and buf.pts is not None
            and buf.pts - self._last_active_pts <= self.window)
        if present != self._present:
            self._present = present
            self.post_element_message("ccdetect", cc608=present)
