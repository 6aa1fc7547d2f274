"""colorlut: .cube 1D/3D color-LUT video filter.

Rebuilds the reference colorlut element (video/colorlut/src/colorlut/
imp.rs) with the trilinear sampling running as a jitted device kernel
(gstpu.ops.lut) — the TPU analogue of the reference's D3D12 compute
path (d3d12colorlut/imp.rs:686 Dispatch).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from gstpu.core.base import VideoFilter
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.core.video import video_caps
from gstpu.ops.lut import (CubeLut, apply_lut_1d, apply_lut_3d,
                           apply_lut_3d_mm, parse_cube)

_FORMATS = ("RGBA", "RGBA64LE", "RGBA64BE")


@register_element("colorlut", Rank.NONE)
class ColorLut(VideoFilter):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    video_caps(formats=_FORMATS)),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    video_caps(formats=_FORMATS)),
    ]

    location = Property(str, default=None, mutable=Mutability.READY,
                        blurb="Path to the .cube LUT file")
    context = Property(str, default=None, mutable=Mutability.READY,
                       blurb="DeviceContext name: N video streams "
                             "with the SAME LUT run as one batched "
                             "frame dispatch")
    fps = Property(int, default=30, minimum=1,
                   mutable=Mutability.READY)

    def __init__(self, name=None):
        super().__init__(name)
        self._lut: CubeLut | None = None
        self._dev_table = None
        self._dev_scale = None
        self._dev_offset = None
        self._ctx = None

    def set_lut(self, lut: CubeLut) -> None:
        """Programmatic LUT injection (tests, in-memory LUTs)."""
        self._lut = lut
        self._dev_table = jnp.asarray(lut.table_3d if lut.is_3d
                                      else lut.table_1d)
        self._dev_scale = jnp.asarray(lut.domain_scale)
        self._dev_offset = jnp.asarray(lut.domain_offset)

    def start(self) -> bool:
        if self.location:
            with open(self.location) as f:
                self.set_lut(parse_cube(f.read()))
        if self._lut is None:
            self.post_error("colorlut: no LUT configured "
                            "(set `location` to a .cube file)")
            return False
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
            if in_info.format.startswith("RGBA64"):
                self.post_error("colorlut: context batching is for "
                                "8-bit formats")
                return False
            nflat = in_info.height * in_info.width \
                * len(in_info.format)
            if self._ctx.block in (0, nflat):
                self._ctx.block = nflat
            elif self._ctx.block != nflat:
                self.post_error("colorlut: context members must "
                                "share the frame geometry")
                return False
            self._ctx.finalize_member(self)
        return True

    # -- DeviceContext contract ------------------------------------------
    def device_batch_spec(self) -> dict:
        import hashlib

        import jax
        info = self.video_info
        H, W = info.height, info.width
        C = len(info.format)
        table, scale, offset = (self._dev_table, self._dev_scale,
                                self._dev_offset)
        lut_id = hashlib.sha1(
            np.asarray(table).tobytes()).hexdigest()[:12]
        is_3d = self._lut.is_3d
        fn = apply_lut_3d if jax.default_backend() == "cpu" or not is_3d \
            else None
        if not is_3d:
            fn = apply_lut_1d
        elif fn is None:
            from gstpu.ops.lut_pallas import (apply_lut_3d_pallas,
                                              pallas_available)
            fn = (apply_lut_3d_pallas if pallas_available()
                  else apply_lut_3d_mm)
        def step(states, x, *_unused):
            # x is (B, H, W, C) in the frame's NATIVE layout (spec
            # sample_shape; see elements/video/hsv.py).  One kernel
            # over all frames: the Pallas LUT streams TP-sized
            # blocks through VMEM, so batching frames adds no
            # resident f32 working set; the (B*H, W, C) merge of
            # adjacent dims is layout-free.
            B = x.shape[0]
            out = fn(x.reshape(B * H, W, C), table, scale, offset,
                     max_val=255)
            return states, out.reshape(B, H, W, C)

        return dict(key=("colorlut", H, W, info.format, lut_id),
                    step=step,
                    sample_shape=(H, W, C),
                    init_state=lambda: (),
                    uniforms=lambda: (),
                    compute_dtype=np.uint8)

    def make_batch_buffer(self, flat, pts, dur):
        from gstpu.runtime.device_batch import DeviceRow
        if isinstance(flat, DeviceRow):
            return Buffer(flat, pts=pts, duration=dur)
        return self.video_info.make_buffer(flat, pts=pts,
                                           duration=dur)

    def drain(self) -> list:
        if self._ctx is not None:
            return self._ctx.flush_member(self)
        return []

    def transform(self, buf: Buffer) -> Buffer:
        info = self.video_info
        if self._ctx is not None:
            from gstpu.runtime.device_batch import _is_device
            if _is_device(buf.data):
                n = info.height * info.width * len(info.format)
                self._ctx.submit(self, buf.data, buf.pts,
                                 n * self.fps)
                return []
            frame = info.view(buf)
            self._ctx.submit(self, np.asarray(frame).reshape(-1),
                             buf.pts, frame.size * self.fps)
            return []                 # outputs flow from the batch
        frame = info.view(buf)
        deep = info.format.startswith("RGBA64")
        if deep:
            # jax has no big-endian dtypes: normalise to native u16
            frame = frame.astype(np.uint16)
        if self._lut.is_3d:
            # TPU 8-bit: Pallas VMEM kernel (the 60 fps/4K path;
            # probe-compiled once with automatic fallback).  16-bit
            # frames use the f32 MXU contraction (bf16 error ~2^-9
            # relative would be ~100 u16 LSBs).  CPU: exact gathers.
            import functools
            import jax as _jax
            if _jax.default_backend() == "cpu":
                fn = apply_lut_3d
            elif deep:
                fn = functools.partial(apply_lut_3d_mm, precise=True)
            else:
                from gstpu.ops.lut_pallas import (apply_lut_3d_pallas,
                                                  pallas_available)
                fn = (apply_lut_3d_pallas if pallas_available()
                      else apply_lut_3d_mm)
        else:
            fn = apply_lut_1d
        out = np.asarray(fn(jnp.asarray(frame), self._dev_table,
                            self._dev_scale, self._dev_offset,
                            max_val=65535 if deep else 255))
        return info.make_buffer(out.reshape(info.height, info.width, -1),
                                pts=buf.pts, duration=buf.duration)
