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
    context = Property(str, default=None, mutable=Mutability.READY,
                       blurb="DeviceContext name: elements sharing it "
                             "execute as ONE batched device dispatch "
                             "(threadshare context analogue)")
    context_block = Property(int, default=None, minimum=64,
                             mutable=Mutability.READY,
                             blurb="Batch block size in flattened "
                                   "samples (context members agree; "
                                   "default 19200)")

    def __init__(self, name=None):
        super().__init__(name)
        self._tail = None
        self._delay_samples = 0
        self._size = 0
        self._ctx = None

    def start(self) -> bool:
        # join the batching window BEFORE data flows (threadshare's
        # Context::acquire in the READY state change): membership is
        # complete before the first batch can fire
        if self.context:
            from gstpu.runtime.device_batch import DeviceContext
            self._ctx = DeviceContext.acquire(self.context,
                                              self.context_block)
            self._ctx.add_member(self)
        return True

    def setup(self, info: AudioInfo) -> bool:
        # delay/size in flattened interleaved samples, floor division —
        # matches reference delay_frames computation (imp.rs:74-78)
        size = max((self.max_delay * info.rate * info.channels) // SECOND, 1)
        d = max((self.delay * info.rate * info.channels) // SECOND, 1)
        self._delay_samples = min(d, size)
        self._size = size
        if self._ctx is not None:
            self._ctx.finalize_member(self)
            self._tail = None
        else:
            self._tail = echo_ops.make_state((), size)
        return True

    # -- DeviceContext contract (runtime/device_batch.py) ---------------
    def device_batch_spec(self) -> dict:
        d, size = self._delay_samples, self._size

        def step(states, x, intensity, feedback):
            return echo_ops.echo_block(states, x, intensity, feedback,
                                       delay=d)

        return dict(key=("rsaudioecho", d, size),
                    step=step,
                    init_state=lambda: echo_ops.make_state((), size),
                    uniforms=lambda: (self.intensity, self.feedback),
                    # echo_block handles any width: required when this
                    # element feeds a priming stage (audioloudnorm's
                    # 3 s first frame) in a fused chain
                    wide_ok=True)

    def make_batch_buffer(self, flat: np.ndarray, pts, dur) -> Buffer:
        return Buffer(flat.reshape(-1, self.audio_info.channels),
                      pts=pts, duration=dur)

    def transform_ip(self, buf: Buffer):
        info = self.audio_info
        if self._ctx is not None:
            from gstpu.runtime.device_batch import _is_device
            data = buf.data if _is_device(buf.data) \
                else info.view(buf).reshape(-1)
            self._ctx.submit(self, data, buf.pts,
                             info.rate * info.channels)
            return []                   # outputs flow from the batch
        x = info.view(buf).reshape(-1)  # flattened interleaved
        xj = jnp.asarray(x)
        self._tail, out = echo_ops.echo_block(
            self._tail, xj,
            jnp.float64(self.intensity), jnp.float64(self.feedback),
            delay=self._delay_samples)
        buf.data = np.asarray(out).reshape(-1, info.channels)

    def drain(self) -> list[Buffer]:
        if self._ctx is not None:
            return self._ctx.flush_member(self)
        return []

    def stop(self) -> bool:
        if self._ctx is not None:
            self._ctx.remove_member(self)
            self._ctx = None
        return super().stop()

    def flush(self) -> None:
        if self._tail is not None:
            self._tail = jnp.zeros_like(self._tail)
