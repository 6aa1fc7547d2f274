"""Audio format descriptors (gst-audio AudioInfo analogue).

The typed view of "audio/x-raw" caps that AudioFilter-style elements
negotiate (reference audio/audiofx/src/audioecho/imp.rs caps F32/F64;
audioloudnorm requires F64 interleaved @192kHz, imp.rs:1846-1871).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction

import numpy as np

from gstpu.core.buffer import Buffer
from gstpu.core.caps import AnyList, Caps, IntRange, Structure

AUDIO_FORMATS: dict[str, np.dtype] = {
    "F64LE": np.dtype("<f8"),
    "F32LE": np.dtype("<f4"),
    "S32LE": np.dtype("<i4"),
    "S24LE": np.dtype("<i4"),  # stored unpacked here
    "S16LE": np.dtype("<i2"),
    "F64BE": np.dtype(">f8"),
    "F32BE": np.dtype(">f4"),
    "S32BE": np.dtype(">i4"),
    "S16BE": np.dtype(">i2"),
    "U8": np.dtype("u1"),
    "S8": np.dtype("i1"),
}


def audio_caps(formats=None, rate=None, channels=None,
               layout: str = "interleaved") -> Caps:
    """Build audio/x-raw caps with optional constraints."""
    st = Structure("audio/x-raw")
    if formats is None:
        st["format"] = AnyList(tuple(AUDIO_FORMATS))
    elif isinstance(formats, str):
        st["format"] = formats
    else:
        st["format"] = AnyList(tuple(formats)) if len(formats) > 1 else formats[0]
    st["rate"] = rate if rate is not None else IntRange(1, 2**31 - 1)
    st["channels"] = channels if channels is not None else IntRange(1, 2**31 - 1)
    st["layout"] = layout
    return Caps([st])


@dataclass
class AudioInfo:
    format: str
    rate: int
    channels: int
    layout: str = "interleaved"

    @property
    def dtype(self) -> np.dtype:
        return AUDIO_FORMATS[self.format]

    @property
    def bpf(self) -> int:
        """Bytes per frame (all channels of one sample instant)."""
        return self.dtype.itemsize * self.channels

    @staticmethod
    def from_caps(caps: Caps) -> "AudioInfo":
        if not caps.is_fixed():
            raise ValueError(f"AudioInfo needs fixed caps: {caps!r}")
        s = caps[0]
        if s.name != "audio/x-raw":
            raise ValueError(f"not raw audio caps: {caps!r}")
        return AudioInfo(format=s["format"], rate=int(s["rate"]),
                         channels=int(s["channels"]),
                         layout=s.get("layout", "interleaved"))

    def to_caps(self) -> Caps:
        return Caps.new("audio/x-raw", format=self.format, rate=self.rate,
                        channels=self.channels, layout=self.layout)

    # -- buffer <-> ndarray views --------------------------------------
    def view(self, buf: Buffer) -> np.ndarray:
        """(frames, channels) zero-copy view of an interleaved buffer."""
        arr = buf.array
        if arr.dtype != self.dtype:
            arr = arr.view(self.dtype)
        return arr.reshape(-1, self.channels)

    def make_buffer(self, samples: np.ndarray, *, pts: int | None = None,
                    duration: int | None = None) -> Buffer:
        samples = np.ascontiguousarray(samples, dtype=self.dtype)
        if samples.ndim == 1:
            samples = samples.reshape(-1, self.channels)
        n = samples.shape[0]
        if duration is None:
            duration = frames_to_ns(n, self.rate)
        return Buffer(samples, pts=pts, duration=duration)


def frames_to_ns(n: int, rate: int) -> int:
    return (n * 1_000_000_000) // rate


def ns_to_frames(t: int, rate: int) -> int:
    return (t * rate) // 1_000_000_000
