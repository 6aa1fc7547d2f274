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
    context = Property(str, default=None, mutable=Mutability.READY,
                       blurb="DeviceContext name: N video streams "
                             "sharing it run as ONE batched frame "
                             "dispatch (SURVEY L2', like rsaudioecho)")
    fps = Property(int, default=30, minimum=1,
                   mutable=Mutability.READY,
                   blurb="frame rate used for batched pts spacing")

    def __init__(self, name=None):
        super().__init__(name)
        self._ctx = None

    def start(self) -> bool:
        if self.context:
            from gstpu.runtime.device_batch import DeviceContext
            # block is finalized once caps arrive (one frame)
            self._ctx = DeviceContext.acquire(self.context, block=0)
            self._ctx.add_member(self)
        return True

    def stop(self) -> bool:
        if self._ctx is not None:
            self._ctx.remove_member(self)
            self._ctx = None
        return super().stop()

    def set_info(self, in_info, out_info) -> bool:
        if self._ctx is not None:
            nflat = in_info.height * in_info.width \
                * len(in_info.format.replace("x", "A"))
            if self._ctx.block in (0, nflat):
                self._ctx.block = nflat
            elif self._ctx.block != nflat:
                self.post_error("hsvfilter: context members must "
                                "share the frame geometry")
                return False
            self._ctx.finalize_member(self)
        return True

    # -- DeviceContext contract ------------------------------------------
    def device_batch_spec(self) -> dict:
        import jax
        info = self.video_info
        H, W = info.height, info.width
        C = len(info.format)
        (r, g, b), _ = _LAYOUTS[info.format]

        def step(states, x, hue, smul, soff, vmul, voff):
            # x is (B, H, W, C) in the frame's NATIVE layout (the
            # spec's sample_shape): channel slice/stack on a natively
            # tiled u8 frame is cheap, while the same ops fused
            # against a flat-row reshape cost ~40 ms/frame at 4K
            # (measured — the difference between 19 and 65 fps).
            # Per-frame unrolled (B is small/static): full-batch
            # vmap at 4K exhausts HBM and lax.map compiles to a
            # pathologically slow loop when composed downstream.
            B = x.shape[0]
            outs = [hsv_ops.hsv_filter_frame(
                x[i], (r, g, b),
                *((p if getattr(p, "ndim", 0) == 0
                   else p[i, 0]).astype(jnp.float32)
                  for p in (hue, smul, soff, vmul, voff)))
                for i in range(B)]
            return states, jnp.stack(outs)

        return dict(key=("hsvfilter", H, W, info.format),
                    step=step,
                    sample_shape=(H, W, C),
                    init_state=lambda: (),
                    uniforms=lambda: (self.hue_shift,
                                      self.saturation_mul,
                                      self.saturation_off,
                                      self.value_mul,
                                      self.value_off),
                    compute_dtype=np.uint8)

    def make_batch_buffer(self, flat, pts, dur) -> Buffer:
        from gstpu.runtime.device_batch import DeviceRow
        if isinstance(flat, DeviceRow):
            return Buffer(flat, pts=pts, duration=dur)
        return self.video_info.make_buffer(flat, pts=pts,
                                           duration=dur)

    def drain(self) -> list:
        if self._ctx is not None:
            return self._ctx.flush_member(self)
        return []

    def transform_ip(self, buf: Buffer) -> None:
        import os
        info = self.video_info
        if self._ctx is not None:
            from gstpu.runtime.device_batch import _is_device
            if _is_device(buf.data):
                n = info.height * info.width * len(info.format)
                self._ctx.submit(self, buf.data, buf.pts,
                                 n * self.fps)
                return []
            frame = info.view(buf)
            # one frame per batch row; fps drives the pts spacing
            self._ctx.submit(self, frame.reshape(-1), buf.pts,
                             frame.size * self.fps)
            return []                 # outputs flow from the batch
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
    context = Property(str, default=None, mutable=Mutability.READY,
                       blurb="DeviceContext name for batched frame "
                             "dispatch across streams")
    fps = Property(int, default=30, minimum=1,
                   mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self._ctx = None

    def start(self) -> bool:
        if self.context:
            from gstpu.runtime.device_batch import DeviceContext
            self._ctx = DeviceContext.acquire(self.context, block=0)
            self._ctx.add_member(self)
        return True

    def stop(self) -> bool:
        if self._ctx is not None:
            self._ctx.remove_member(self)
            self._ctx = None
        return super().stop()

    def set_info(self, in_info, out_info) -> bool:
        if self._ctx is not None:
            if len(in_info.format) != 4:
                # 3ch->4ch would change the row size mid-batch
                self.post_error("hsvdetector: context batching needs "
                                "a 4-channel input format")
                return False
            nflat = in_info.height * in_info.width \
                * len(in_info.format)
            if self._ctx.block in (0, nflat):
                self._ctx.block = nflat
            elif self._ctx.block != nflat:
                self.post_error("hsvdetector: context members must "
                                "share frame geometry")
                return False
            self._ctx.finalize_member(self)
        return True

    def device_batch_spec(self) -> dict:
        import jax
        in_info, out_info = self.video_info, self.out_video_info
        H, W = in_info.height, in_info.width
        C = len(in_info.format)
        (r, g, b), _ = _LAYOUTS[in_info.format]
        (ro, go, bo), ao = _LAYOUTS[out_info.format]

        def step(states, x, h_ref, h_var, s_ref, s_var, v_ref,
                 v_var):
            # (B, H, W, C_in) native in -> (B, H, W, 4) native out;
            # per-frame unrolled like HsvFilter (same rationale)
            B = x.shape[0]
            outs = [hsv_ops.hsv_detect_frame(
                x[i], (r, g, b), (ro, go, bo, ao),
                *((p if getattr(p, "ndim", 0) == 0
                   else p[i, 0]).astype(jnp.float32)
                  for p in (h_ref, h_var, s_ref, s_var, v_ref,
                            v_var)))
                for i in range(B)]
            return states, jnp.stack(outs)

        return dict(key=("hsvdetector", H, W, in_info.format,
                         out_info.format),
                    step=step,
                    sample_shape=(H, W, C),
                    init_state=lambda: (),
                    uniforms=lambda: (self.hue_ref, self.hue_var,
                                      self.saturation_ref,
                                      self.saturation_var,
                                      self.value_ref,
                                      self.value_var),
                    compute_dtype=np.uint8)

    def make_batch_buffer(self, flat, pts, dur):
        return self.out_video_info.make_buffer(flat, pts=pts,
                                               duration=dur)

    def drain(self) -> list:
        if self._ctx is not None:
            return self._ctx.flush_member(self)
        return []

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
        if self._ctx is not None:
            self._ctx.submit(self, np.asarray(frame).reshape(-1),
                             buf.pts, frame.size * self.fps)
            return []
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
