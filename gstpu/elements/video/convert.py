"""videoconvert: raw video format conversion (core plumbing the
reference gets from GStreamer's C videoconvert; needed for standalone
pipelines here). Packed RGB family <-> I420 <-> GRAY8, BT.601
full-range like gstpu's videotestsrc."""

from __future__ import annotations

import numpy as np

from gstpu.core.base import VideoFilter
from gstpu.core.buffer import Buffer
from gstpu.core.caps import AnyList, Caps, Structure
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.registry import Rank, register_element
from gstpu.core.video import (PACKED_FORMATS, VideoInfo, video_caps)
from gstpu.elements.generic.testsrc import _rgb_to_i420

_FORMATS = ("RGBA", "BGRA", "ARGB", "ABGR", "RGBx", "BGRx", "xRGB",
            "xBGR", "RGB", "BGR", "GRAY8", "I420")

_RGB_ORDER = {
    "RGBA": (0, 1, 2), "BGRA": (2, 1, 0), "ARGB": (1, 2, 3),
    "ABGR": (3, 2, 1), "RGBx": (0, 1, 2), "BGRx": (2, 1, 0),
    "xRGB": (1, 2, 3), "xBGR": (3, 2, 1), "RGB": (0, 1, 2),
    "BGR": (2, 1, 0),
}


def _to_rgb(info: VideoInfo, buf: Buffer) -> np.ndarray:
    """Any supported format -> (H, W, 3) RGB uint8."""
    fmt = info.format
    if fmt in _RGB_ORDER:
        frame = info.view(buf)
        r, g, b = _RGB_ORDER[fmt]
        return np.stack([frame[..., r], frame[..., g], frame[..., b]],
                        axis=-1)
    if fmt == "GRAY8":
        y = info.view(buf)[..., 0]
        return np.repeat(y[..., None], 3, axis=-1)
    if fmt == "I420":
        y, u, v = info.planes(buf)
        h, w = info.height, info.width
        uf = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w] \
            .astype(np.float32) - 128.0
        vf = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w] \
            .astype(np.float32) - 128.0
        yf = y.astype(np.float32)
        r = yf + 1.402 * vf
        g = yf - 0.344136 * uf - 0.714136 * vf
        b = yf + 1.772 * uf
        return np.clip(np.stack([r, g, b], -1), 0, 255) \
            .round().astype(np.uint8)
    raise ValueError(f"videoconvert: cannot read {fmt}")


def _from_rgb(rgb: np.ndarray, fmt: str) -> np.ndarray:
    h, w = rgb.shape[:2]
    if fmt in _RGB_ORDER:
        n = PACKED_FORMATS[fmt]
        out = np.full((h, w, n), 255, np.uint8)
        r, g, b = _RGB_ORDER[fmt]
        out[..., r], out[..., g], out[..., b] = (rgb[..., 0], rgb[..., 1],
                                                 rgb[..., 2])
        return out.reshape(-1)
    if fmt == "GRAY8":
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        return y.round().astype(np.uint8).reshape(-1)
    if fmt == "I420":
        return _rgb_to_i420(rgb)
    raise ValueError(f"videoconvert: cannot write {fmt}")


@register_element("videoconvert", Rank.PRIMARY)
class VideoConvert(VideoFilter):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    video_caps(formats=_FORMATS)),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps(formats=_FORMATS)),
    ]

    def transform_caps(self, direction, caps, filter):
        def repl(s: Structure):
            if s.name != "video/x-raw":
                return None
            s["format"] = AnyList(_FORMATS)
            return s
        out = caps.map_structures(repl)
        if filter is not None:
            out = filter.intersect(out)
        return out

    def fixate_caps(self, direction, caps, othercaps):
        near = caps[0] if len(caps) else None
        return Caps([othercaps[0].fixate(near)])

    def transform(self, buf: Buffer) -> Buffer:
        if self.video_info.format == self.out_video_info.format:
            return buf
        rgb = _to_rgb(self.video_info, buf)
        out = _from_rgb(rgb, self.out_video_info.format)
        return self.out_video_info.make_buffer(out, pts=buf.pts,
                                               duration=buf.duration)
