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

    def __init__(self, name=None):
        super().__init__(name)
        self._lut: CubeLut | None = None
        self._dev_table = None
        self._dev_scale = None
        self._dev_offset = None

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
        return True

    def transform(self, buf: Buffer) -> Buffer:
        info = self.video_info
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
