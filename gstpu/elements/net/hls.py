"""hlscmafsink: HLS segmenter/playlist writer for CMAF fragments.

Rebuilds the reference hlssink3 crate's CMAF path
(net/hlssink3 hlscmafsink): the HEADER buffer from cmafmux becomes the
init segment (#EXT-X-MAP), every following fragment becomes a .m4s
segment file, and the media playlist is rewritten per segment with a
sliding window (playlist-length) like the m3u8-rs-based writer.
"""

from __future__ import annotations

import os

from gstpu.core.base import BaseSink
from gstpu.core.buffer import Buffer, BufferFlags
from gstpu.core.caps import Caps
from gstpu.core.element import (FlowReturn, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element

SECOND = 1_000_000_000


@register_element("hlscmafsink", Rank.NONE)
class HlsCmafSink(BaseSink):
    PAD_TEMPLATES = [PadTemplate("sink", PadDirection.SINK,
                                 PadPresence.ALWAYS,
                                 Caps.new("video/quicktime"))]

    location = Property(str, default="segment%05d.m4s",
                        mutable=Mutability.READY,
                        blurb="Segment filename template")
    init_location = Property(str, default="init.mp4",
                             mutable=Mutability.READY)
    playlist_location = Property(str, default="playlist.m3u8",
                                 mutable=Mutability.READY)
    target_duration = Property(int, default=6, minimum=1,
                               mutable=Mutability.READY,
                               blurb="EXT-X-TARGETDURATION (s)")
    playlist_length = Property(int, default=0, minimum=0,
                               mutable=Mutability.READY,
                               blurb="Sliding window size (0 = all)")

    def __init__(self, name=None):
        super().__init__(name)
        self._segments: list[tuple[str, float]] = []
        self._seg_index = 0
        self._media_sequence = 0
        self._have_init = False
        self._pending: list[bytes] = []
        self._pending_pts: int | None = None
        self._last_pts: int | None = None

    def render(self, buf: Buffer):
        data = buf.to_bytes()
        if buf.has_flag(BufferFlags.HEADER) and not self._have_init:
            with open(self.init_location, "wb") as f:
                f.write(data)
            self._have_init = True
            return FlowReturn.OK
        # each fragment buffer becomes one segment
        dur = (buf.duration / SECOND) if buf.duration \
            else float(self.target_duration)
        name = self.location % self._seg_index \
            if "%" in self.location else f"{self.location}{self._seg_index}"
        with open(name, "wb") as f:
            f.write(data)
        self._seg_index += 1
        self._segments.append((name, dur))
        if self.playlist_length and \
                len(self._segments) > self.playlist_length:
            old, _ = self._segments.pop(0)
            self._media_sequence += 1
            try:
                os.unlink(old)
            except OSError:
                pass
        self._write_playlist(ended=False)
        return FlowReturn.OK

    def _write_playlist(self, ended: bool) -> None:
        lines = ["#EXTM3U", "#EXT-X-VERSION:7",
                 f"#EXT-X-TARGETDURATION:{self.target_duration}",
                 f"#EXT-X-MEDIA-SEQUENCE:{self._media_sequence}",
                 f'#EXT-X-MAP:URI="{os.path.basename(self.init_location)}"']
        for name, dur in self._segments:
            lines.append(f"#EXTINF:{dur:.3f},")
            lines.append(os.path.basename(name))
        if ended:
            lines.append("#EXT-X-ENDLIST")
        with open(self.playlist_location, "w") as f:
            f.write("\n".join(lines) + "\n")

    def on_eos(self) -> None:
        self._write_playlist(ended=True)
