"""audiornnoise: frame-based noise suppression element.

Rebuilds the reference element (audio/audiofx/src/audiornnoise/imp.rs):
F32 @ 48 kHz, 480-sample frames, one denoiser state per channel,
max-over-channels VAD gating (frames below voice-activity-threshold are
muted), AudioLevelMeta on output, EOS drain with zero-padding.
Engine: gstpu.ops.rnnoise (loadable RNNoise GRU weights or the default
spectral gate — see that module's docstring for the weights story).
"""

from __future__ import annotations

import numpy as np

from gstpu.core.adapter import SampleAdapter
from gstpu.core.audio import AudioInfo, audio_caps
from gstpu.core.base import BaseTransform
from gstpu.core.buffer import Buffer, Meta
from gstpu.core.caps import Caps
from gstpu.core.element import PadDirection, PadPresence, PadTemplate
from gstpu.core.props import Mutability, Property
from gstpu.core.query import LatencyQuery
from gstpu.core.registry import Rank, register_element
from gstpu.ops.rnnoise import FRAME_SIZE, DenoiseState, GruModel

SECOND = 1_000_000_000


class AudioLevelMeta(Meta):
    """gst_audio AudioLevelMeta analogue (level dB u8, voice flag)."""

    def __init__(self, level: int, has_voice: bool):
        self.level = level
        self.has_voice = has_voice


_CAPS = audio_caps(formats="F32LE", rate=48000)


@register_element("audiornnoise", Rank.NONE)
class AudioRNNoise(BaseTransform):
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS,
                    _CAPS.copy()),
        PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS,
                    _CAPS.copy()),
    ]

    voice_activity_threshold = Property(
        float, default=0.0, minimum=0.0, maximum=1.0,
        mutable=Mutability.PLAYING,
        blurb="Frames with VAD below this are muted")
    model_location = Property(str, default=None, mutable=Mutability.READY,
                              blurb="Optional .npz RNNoise weight file")
    engine = Property(str, default="auto", mutable=Mutability.READY,
                      blurb="'auto' (GRU on device when weights are "
                            "set, else spectral gate), 'device', "
                            "'host', 'spectral'")

    def __init__(self, name=None):
        super().__init__(name)
        self._denoisers: list[DenoiseState] = []
        self._adapter: SampleAdapter | None = None
        self._info: AudioInfo | None = None

    def set_caps(self, incaps: Caps, outcaps: Caps) -> bool:
        self._info = AudioInfo.from_caps(incaps)
        self._denoisers = []
        eng = self.engine
        if eng == "auto":
            # host GRU: per-frame streaming dispatch; the device (JAX)
            # engine pays an RPC per 10 ms frame unless batched
            eng = "host" if self.model_location else "spectral"
        if eng != "spectral" and not self.model_location:
            self.post_error("audiornnoise: GRU engine needs "
                            "model-location (.npz weights)")
            return False
        for _ in range(self._info.channels):
            if eng == "spectral":
                model = None
            elif eng == "host":
                model = GruModel.load(self.model_location)
            else:
                from gstpu.ops.rnnoise import JaxGruModel
                model = JaxGruModel.load(self.model_location)
            self._denoisers.append(DenoiseState(model))
        self._adapter = SampleAdapter(self._info.rate)
        return True

    def transform(self, buf: Buffer) -> list[Buffer] | None:
        info = self._info
        self._adapter.push(info.view(buf).astype(np.float32), pts=buf.pts)
        avail = self._adapter.available()
        n_frames = avail // FRAME_SIZE
        if n_frames == 0:
            return None
        samples, pts, dur = self._adapter.take_pts(n_frames * FRAME_SIZE)
        return [self._process(samples, pts)]

    def _process(self, samples: np.ndarray, pts) -> Buffer:
        info = self._info
        ch = info.channels
        out = np.empty_like(samples)
        has_voice = False
        for off in range(0, samples.shape[0], FRAME_SIZE):
            frame = samples[off:off + FRAME_SIZE]
            vad = 0.0
            outs = []
            for c in range(ch):
                y, v = self._denoisers[c].process_frame(
                    frame[:, c] * 32767.0)
                outs.append(y / 32767.0)
                vad = max(vad, v)
            if vad < self.voice_activity_threshold:
                out[off:off + FRAME_SIZE] = 0.0
            else:
                if vad >= 0.98:
                    has_voice = True
                out[off:off + FRAME_SIZE] = np.stack(outs, axis=1)
        rms = float(np.sum(out * out))
        level = int(np.clip(-20.0 * np.log10(rms + np.finfo(np.float32).eps),
                            0.0, 255.0))
        b = info.make_buffer(out.astype(np.float32), pts=pts)
        b.add_meta(AudioLevelMeta(level, has_voice))
        return b

    def drain(self) -> list[Buffer]:
        if self._adapter is None:
            return []
        avail = self._adapter.available()
        if avail == 0:
            return []
        samples, pts, _ = self._adapter.take_pts(avail)
        pad = np.zeros((FRAME_SIZE - (avail % FRAME_SIZE) if
                        avail % FRAME_SIZE else 0,
                        self._info.channels), np.float32)
        full = np.concatenate([samples.astype(np.float32), pad])
        b = self._process(full, pts)
        # reference drains padded full frames (generate_output keeps
        # whole frames); emit only the real samples
        arr = b.array.reshape(-1, self._info.channels)[:avail]
        out = self._info.make_buffer(arr, pts=pts)
        out.metas = b.metas
        return [out]

    def flush(self) -> None:
        if self._adapter is not None:
            self._adapter.clear()
        for d in self._denoisers:
            d.reset()

    def add_latency(self, q: LatencyQuery) -> None:
        # one 480-sample frame at 48 kHz = 10 ms (the reference computes
        # this with integer division and adds 0 — imp.rs:377-379; we
        # report the true value)
        q.add(FRAME_SIZE * SECOND // 48000, FRAME_SIZE * SECOND // 48000)
