"""rsaudioecho / rsagingradio: audio effects with device kernels.

Rebuilds the reference audiofx elements
(audio/audiofx/src/audioecho/imp.rs, agingradio/imp.rs) as AudioFilter
subclasses whose hot loops are jitted JAX kernels (gstpu.ops.echo).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from gstpu.core.audio import AudioInfo, audio_caps
from gstpu.core.base import AudioFilter
from gstpu.core.buffer import Buffer
from gstpu.core.caps import Caps
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.props import Mutability, Property
from gstpu.core.registry import Rank, register_element
from gstpu.ops import echo as echo_ops

SECOND = 1_000_000_000

_ECHO_CAPS = audio_caps(formats=("F64LE", "F32LE"))


def _tmpl(name, direction):
    return PadTemplate(name, direction, PadPresence.ALWAYS,
                       _ECHO_CAPS.copy())


@register_element("rsaudioecho", Rank.NONE)
class AudioEcho(AudioFilter):
    """Echo/reverb filter.

    Properties mirror the reference (audioecho/imp.rs:96-133): delay and
    max-delay in ns, only mutable up to READY (which is what lets the
    kernel bake the delay as a static shape); intensity/feedback are
    device uniforms.
    """

    IN_PLACE = True
    PAD_TEMPLATES = [_tmpl("sink", PadDirection.SINK),
                     _tmpl("src", PadDirection.SRC)]

    max_delay = Property(int, default=1 * SECOND, minimum=1,
                         mutable=Mutability.READY,
                         blurb="Maximum echo delay (ns)")
    delay = Property(int, default=SECOND // 2, minimum=1,
                     mutable=Mutability.READY, blurb="Echo delay (ns)")
    intensity = Property(float, default=0.5, minimum=0.0, maximum=1.0,
                         mutable=Mutability.PLAYING)
    feedback = Property(float, default=0.0, minimum=0.0, maximum=1.0,
                        mutable=Mutability.PLAYING)

    def __init__(self, name=None):
        super().__init__(name)
        self._tail = None
        self._delay_samples = 0

    def setup(self, info: AudioInfo) -> bool:
        # delay/size in flattened interleaved samples, floor division —
        # matches reference delay_frames computation (imp.rs:74-78)
        size = max((self.max_delay * info.rate * info.channels) // SECOND, 1)
        d = max((self.delay * info.rate * info.channels) // SECOND, 1)
        self._delay_samples = min(d, size)
        self._tail = echo_ops.make_state((), size)
        return True

    def transform_ip(self, buf: Buffer) -> None:
        info = self.audio_info
        x = info.view(buf).reshape(-1)  # flattened interleaved
        xj = jnp.asarray(x)
        self._tail, out = echo_ops.echo_block(
            self._tail, xj,
            jnp.float64(self.intensity), jnp.float64(self.feedback),
            delay=self._delay_samples)
        buf.data = np.asarray(out).reshape(-1, info.channels)

    def flush(self) -> None:
        if self._tail is not None:
            self._tail = jnp.zeros_like(self._tail)
