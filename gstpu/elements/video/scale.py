"""videoscale: raw video resizing (core plumbing the reference gets
from GStreamer's C videoscale; needed here for webrtcsink's bitrate
mitigation — reference net/webrtc/src/webrtcsink/imp.rs downscale
mitigation drives a capsfilter behind videoscale).

The resample itself runs as a jitted jax.image.resize, so on TPU the
gather/blend lowers onto the device instead of the host.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from gstpu.core.base import VideoFilter
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps, IntRange, Structure
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.core.video import PACKED_FORMATS, video_caps

_FORMATS = tuple(PACKED_FORMATS) + ("I420",)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _resize(img, oh: int, ow: int, method: str):
    shape = (oh, ow) + img.shape[2:]
    out = jax.image.resize(img.astype(jax.numpy.float32), shape, method)
    return jax.numpy.clip(jax.numpy.round(out), 0, 255).astype(
        jax.numpy.uint8)


@register_element("videoscale", Rank.PRIMARY)
class VideoScale(VideoFilter):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    video_caps(formats=_FORMATS)),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps(formats=_FORMATS)),
    ]

    method = Property(str, default="bilinear", mutable=Mutability.READY,
                      blurb="nearest|bilinear")

    def transform_caps(self, direction, caps, filter):
        def repl(s: Structure):
            if s.name != "video/x-raw":
                return None
            s = s.copy()
            s["width"] = IntRange(1, 2147483647)
            s["height"] = IntRange(1, 2147483647)
            return s
        out = caps.map_structures(repl)
        if filter is not None:
            out = filter.intersect(out)
        return out

    def fixate_caps(self, direction, caps, othercaps):
        near = caps[0] if len(caps) else None
        return Caps([othercaps[0].fixate(near)])

    def transform(self, buf: Buffer) -> Buffer:
        ii, oo = self.video_info, self.out_video_info
        if (ii.width, ii.height) == (oo.width, oo.height):
            return buf
        m = "nearest" if self.method == "nearest" else "linear"
        if ii.format == "I420":
            y, u, v = ii.planes(buf)
            oy = np.asarray(_resize(y[..., None], oo.height, oo.width, m))
            ch, cw = (oo.height + 1) // 2, (oo.width + 1) // 2
            ou = np.asarray(_resize(u[..., None], ch, cw, m))
            ov = np.asarray(_resize(v[..., None], ch, cw, m))
            data = np.concatenate([oy.reshape(-1), ou.reshape(-1),
                                   ov.reshape(-1)])
        else:
            frame = ii.view(buf)
            data = np.asarray(_resize(frame, oo.height, oo.width, m)) \
                .reshape(-1)
        return oo.make_buffer(data, pts=buf.pts, duration=buf.duration)
