"""hsvfilter / hsvdetector: per-pixel HSV video elements.

Rebuilds the reference video/hsv crate as VideoFilter subclasses whose
frame loops are the jitted kernels in gstpu.ops.hsv. Packed RGB-family
formats; the detector converts to an alpha-capable output format and
keys the alpha channel (hsvdetector/imp.rs:380-470).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from gstpu.core.base import VideoFilter
from gstpu.core.buffer import Buffer
from gstpu.core.caps import AnyList, Caps, Structure
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.core.video import VideoInfo, video_caps
from gstpu.ops import hsv as hsv_ops

# channel layout: (color offsets (r,g,b), alpha offset or None)
_LAYOUTS = {
    "RGB": ((0, 1, 2), None), "BGR": ((2, 1, 0), None),
    "RGBx": ((0, 1, 2), None), "BGRx": ((2, 1, 0), None),
    "RGBA": ((0, 1, 2), 3), "BGRA": ((2, 1, 0), 3),
    "xRGB": ((1, 2, 3), None), "xBGR": ((3, 2, 1), None),
    "ARGB": ((1, 2, 3), 0), "ABGR": ((3, 2, 1), 0),
}

_FILTER_FORMATS = tuple(_LAYOUTS)
_DETECTOR_OUT_FORMATS = ("RGBA", "BGRA", "ARGB", "ABGR")


@register_element("hsvfilter", Rank.NONE)
class HsvFilter(VideoFilter):
    IN_PLACE = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    video_caps(formats=_FILTER_FORMATS)),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps(formats=_FILTER_FORMATS)),
    ]

    hue_shift = Property(float, default=0.0, mutable=Mutability.PLAYING,
                         blurb="Hue shift in degrees")
    saturation_mul = Property(float, default=1.0,
                              mutable=Mutability.PLAYING)
    saturation_off = Property(float, default=0.0,
                              mutable=Mutability.PLAYING)
    value_mul = Property(float, default=1.0, mutable=Mutability.PLAYING)
    value_off = Property(float, default=0.0, mutable=Mutability.PLAYING)

    def transform_ip(self, buf: Buffer) -> None:
        import os
        info = self.video_info
        frame = info.view(buf)
        (r, g, b), _ = _LAYOUTS[info.format]
        rgb = np.stack([frame[..., r], frame[..., g], frame[..., b]],
                       axis=-1)
        if os.environ.get("GSTPU_PALLAS") == "1":
            # hand-tiled Pallas kernel (opt-in: the dev-tunnel's remote
            # Mosaic compile service is flaky; the jnp path compiles
            # identically-fused XLA and is the default)
            from gstpu.ops.hsv_pallas import hsv_filter_frame_pallas
            out = np.asarray(hsv_filter_frame_pallas(
                rgb, self.hue_shift, self.saturation_mul,
                self.saturation_off, self.value_mul, self.value_off))
        else:
            out = np.asarray(hsv_ops.hsv_filter(
                jnp.asarray(rgb), jnp.float32(self.hue_shift),
                jnp.float32(self.saturation_mul),
                jnp.float32(self.saturation_off),
                jnp.float32(self.value_mul), jnp.float32(self.value_off)))
        new = frame.copy()
        new[..., r], new[..., g], new[..., b] = (out[..., 0], out[..., 1],
                                                 out[..., 2])
        buf.data = new


@register_element("hsvdetector", Rank.NONE)
class HsvDetector(VideoFilter):
    """Keys pixels matching an HSV window into the output alpha."""

    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    video_caps(formats=_FILTER_FORMATS)),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps(formats=_DETECTOR_OUT_FORMATS)),
    ]

    hue_ref = Property(float, default=0.0, mutable=Mutability.PLAYING)
    hue_var = Property(float, default=10.0, minimum=0.0, maximum=180.0,
                       mutable=Mutability.PLAYING)
    saturation_ref = Property(float, default=0.0, mutable=Mutability.PLAYING)
    saturation_var = Property(float, default=0.15, minimum=0.0, maximum=1.0,
                              mutable=Mutability.PLAYING)
    value_ref = Property(float, default=0.0, mutable=Mutability.PLAYING)
    value_var = Property(float, default=0.3, minimum=0.0, maximum=1.0,
                         mutable=Mutability.PLAYING)

    def transform_caps(self, direction, caps, filter):
        def repl(s: Structure) -> Structure | None:
            if s.name != "video/x-raw":
                return None
            if direction is PadDirection.SINK:
                s["format"] = AnyList(_DETECTOR_OUT_FORMATS)
            else:
                s["format"] = AnyList(_FILTER_FORMATS)
            return s
        out = caps.map_structures(repl)
        if filter is not None:
            out = filter.intersect(out)
        return out

    def transform(self, buf: Buffer) -> Buffer:
        in_info, out_info = self.video_info, self.out_video_info
        frame = in_info.view(buf)
        (r, g, b), _ = _LAYOUTS[in_info.format]
        rgb = np.stack([frame[..., r], frame[..., g], frame[..., b]],
                       axis=-1)
        alpha = np.asarray(hsv_ops.hsv_detect(
            jnp.asarray(rgb), jnp.float32(self.hue_ref),
            jnp.float32(self.hue_var), jnp.float32(self.saturation_ref),
            jnp.float32(self.saturation_var), jnp.float32(self.value_ref),
            jnp.float32(self.value_var)))
        (ro, go, bo), ao = _LAYOUTS[out_info.format]
        out = np.empty((in_info.height, in_info.width, 4), np.uint8)
        out[..., ro], out[..., go], out[..., bo] = rgb[..., 0], \
            rgb[..., 1], rgb[..., 2]
        out[..., ao] = alpha
        return out_info.make_buffer(out.reshape(-1), pts=buf.pts,
                                    duration=buf.duration)
