"""compositor / skiacompositor: N video inputs alpha-blended onto a
canvas.

Rebuilds the reference video/skia compositor's surface (per-pad
xpos/ypos/width/height/alpha, a background property) with the blend
itself as a jitted JAX kernel — the TPU-native stand-in for the skia
raster pipeline (VERDICT/PARITY: GUI raster libs are env-gated; the
math is not). Per-pad placement uses the same pad-property shape as
GStreamer's compositor: request a sink pad, then set
`pad.xpos/ypos/width/height/alpha`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gstpu.core.base import Aggregator, AggregatorPad
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import (FlowReturn, PadDirection, PadPresence,
                                PadTemplate)
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.core.video import VideoInfo, video_caps

SECOND = 1_000_000_000


@partial(jax.jit, static_argnums=(2, 3))
def _blend(canvas, layer_rgba, y0: int, x0: int, alpha):
    """Alpha-blend one RGBA layer onto the canvas at (y0, x0)."""
    h, w = layer_rgba.shape[:2]
    region = jax.lax.dynamic_slice(canvas, (y0, x0, 0),
                                   (h, w, canvas.shape[2]))
    la = layer_rgba[..., 3:4].astype(jnp.float32) / 255.0 * alpha
    lrgb = layer_rgba[..., :3].astype(jnp.float32)
    out = region.astype(jnp.float32) * (1.0 - la) + lrgb * la
    out = jnp.clip(jnp.round(out), 0, 255).astype(canvas.dtype)
    return jax.lax.dynamic_update_slice(canvas, out, (y0, x0, 0))


class CompositorPad(AggregatorPad):
    """Sink pad with placement properties (reference compositor pad:
    xpos/ypos/width/height/alpha)."""

    def __init__(self, name, template, element):
        super().__init__(name, template, element)
        self.xpos = 0
        self.ypos = 0
        self.width = 0        # 0 = native
        self.height = 0
        self.alpha = 1.0


@register_element("compositor", Rank.NONE)
class Compositor(Aggregator):
    PAD_TEMPLATES = [
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps(formats=("RGB",))),
        PadTemplate("sink_%u", PadDirection.SINK,
                    PadPresence.REQUEST,
                    video_caps(formats=("RGB", "RGBA", "GRAY8",
                                        "I420"))),
    ]
    PAD_CLASS = CompositorPad

    background = Property(str, default="black",
                          mutable=Mutability.READY,
                          enum_values=("black", "white", "checker",
                                       "transparent"),
                          blurb="Canvas fill (reference background)")
    width = Property(int, default=0, minimum=0, maximum=16384,
                     mutable=Mutability.READY,
                     blurb="Output width (0 = max of inputs)")
    height = Property(int, default=0, minimum=0, maximum=16384,
                      mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self._out_info: VideoInfo | None = None
        self._frame_n = 0

    def request_pad(self, name=None):
        n = sum(1 for p in self.pads.values()
                if p.direction is PadDirection.SINK)
        pad = CompositorPad(f"sink_{n}", self.PAD_TEMPLATES[1], self)
        self.add_pad(pad)
        return pad

    # -- canvas ----------------------------------------------------------
    def _canvas_size(self) -> tuple[int, int]:
        if self.width and self.height:
            return self.width, self.height
        w = h = 0
        for pad in self.agg_sink_pads():
            if pad.current_caps is None:
                continue
            s = pad.current_caps[0]
            pw = int(pad.width or s.get("width", 0))
            ph = int(pad.height or s.get("height", 0))
            w = max(w, pad.xpos + pw)
            h = max(h, pad.ypos + ph)
        return (self.width or w), (self.height or h)

    def _background(self, w: int, h: int) -> np.ndarray:
        if self.background == "white":
            return np.full((h, w, 3), 255, np.uint8)
        if self.background == "checker":
            yy, xx = np.mgrid[0:h, 0:w]
            cells = ((yy // 8 + xx // 8) % 2) * 64 + 96
            return np.repeat(cells[..., None], 3, -1).astype(np.uint8)
        return np.zeros((h, w, 3), np.uint8)   # black / transparent

    def negotiate_src_caps(self) -> Caps:
        w, h = self._canvas_size()
        return Caps.new("video/x-raw", format="RGB", width=w,
                        height=h)

    # -- aggregation --------------------------------------------------------
    def aggregate(self, timeout: bool) -> FlowReturn:
        pads = [p for p in self.agg_sink_pads()]
        if not pads or any(p.current_caps is None for p in pads):
            return FlowReturn.OK
        # one frame per pad per output frame
        bufs = {}
        for p in pads:
            b = p.pop_buffer()
            if b is not None:
                bufs[p.name] = (p, b)
        if not bufs:
            return FlowReturn.OK
        w, h = self._canvas_size()
        if self._out_info is None:
            self._out_info = VideoInfo("RGB", w, h)
        canvas = jnp.asarray(self._background(w, h))
        pts = None
        from gstpu.elements.video.convert import _to_rgb
        for p, b in bufs.values():
            if pts is None:
                pts = b.pts
            info = VideoInfo.from_caps(p.current_caps)
            rgb = _to_rgb(info, b)
            if (p.width and p.width != info.width) or \
                    (p.height and p.height != info.height):
                from gstpu.elements.video.scale import _resize
                tw = p.width or info.width
                th = p.height or info.height
                rgb = np.asarray(_resize(rgb, th, tw, "linear"))
            lh, lw = rgb.shape[:2]
            # clip the layer to the canvas
            x0, y0 = max(0, p.xpos), max(0, p.ypos)
            if x0 >= w or y0 >= h:
                continue
            lw = min(lw, w - x0)
            lh = min(lh, h - y0)
            rgba = np.concatenate(
                [rgb[:lh, :lw],
                 np.full((lh, lw, 1), 255, np.uint8)], axis=-1)
            canvas = _blend(canvas, jnp.asarray(rgba), y0, x0,
                            jnp.float32(p.alpha))
        out = self._out_info.make_buffer(
            np.asarray(canvas).reshape(-1), pts=pts,
            duration=SECOND // 30)
        self._frame_n += 1
        return self.srcpad.push(out)

    def drain(self) -> None:
        self.aggregate(timeout=False)


@register_element("skiacompositor", Rank.NONE)
class SkiaCompositor(Compositor):
    """Reference-exact name alias: the skia raster library is
    env-gated, the compositing runs as the JAX kernel above."""
