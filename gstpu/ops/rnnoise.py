"""RNNoise-style denoiser core: band-gain spectral suppression.

Re-implements the DSP skeleton of the reference audiornnoise element's
engine (the nnnoiseless crate, itself an RNNoise port): 480-sample
frames at 48 kHz, 960-point Vorbis-windowed STFT with 50% overlap-add,
22 triangular Bark-ish bands (the RNNoise eband5ms layout), per-band
gains applied via interpolation, and a voice-activity estimate.

Gains come from one of two models:
  * `GruModel` — the RNNoise network (dense -> GRU stack -> sigmoid
    band gains + VAD head) as jax lax.scan-able cells, with weights
    loaded from an .npz file (the published rnnoise weights are not
    redistributable inside this repo; any weight set with matching
    shapes loads).
  * `SpectralGate` — a classical noise-floor tracker (minimum
    statistics + Wiener-style gain), the default so the element
    denoises usefully out of the box.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

FRAME_SIZE = 480
WINDOW_SIZE = 2 * FRAME_SIZE
FREQ_SIZE = FRAME_SIZE + 1
NB_BANDS = 22

# RNNoise band edges in FFT bins (eband5ms << 2)
_EBAND5MS = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24,
                      28, 34, 40, 48, 60, 78, 100])
BAND_EDGES = _EBAND5MS * 4  # bins into the 481-bin half spectrum


def vorbis_window() -> np.ndarray:
    """sin(pi/2 * sin^2) window used by RNNoise's analysis/synthesis."""
    i = np.arange(WINDOW_SIZE)
    inner = np.sin(0.5 * np.pi * (i + 0.5) / FRAME_SIZE)
    # first half ascends, second half descends (symmetric)
    half = np.sin(0.5 * np.pi * np.sin(
        0.5 * np.pi * (np.arange(FRAME_SIZE) + 0.5) / FRAME_SIZE) ** 2)
    return np.concatenate([half, half[::-1]])


def band_energies(spec: np.ndarray) -> np.ndarray:
    """Triangular-interpolated band energies (compute_band_energy)."""
    e = np.zeros(spec.shape[:-1] + (NB_BANDS,))
    p = np.abs(spec) ** 2
    for b in range(NB_BANDS - 1):
        lo, hi = BAND_EDGES[b], BAND_EDGES[b + 1]
        size = hi - lo
        frac = np.arange(size) / size
        seg = p[..., lo:hi]
        e[..., b] += np.sum(seg * (1 - frac), axis=-1)
        e[..., b + 1] += np.sum(seg * frac, axis=-1)
    e[..., 0] *= 2
    e[..., -1] *= 2
    return e


def interp_band_gain(gains: np.ndarray) -> np.ndarray:
    """Expand per-band gains to per-bin gains (interp_band_gain)."""
    out = np.zeros(gains.shape[:-1] + (FREQ_SIZE,))
    for b in range(NB_BANDS - 1):
        lo, hi = BAND_EDGES[b], BAND_EDGES[b + 1]
        size = hi - lo
        frac = np.arange(size) / size
        out[..., lo:hi] = (gains[..., b, None] * (1 - frac)
                           + gains[..., b + 1, None] * frac)
    out[..., BAND_EDGES[-1]:] = gains[..., -1, None]
    return out


class SpectralGate:
    """Minimum-statistics noise tracker + Wiener gain (classical
    fallback model; stateful per stream)."""

    def __init__(self, alpha: float = 0.95, floor_track: float = 0.9995,
                 min_gain: float = 0.05):
        self.alpha = alpha
        self.floor_track = floor_track
        self.min_gain = min_gain
        self.noise = None
        self.smoothed = None

    def frame_gains(self, eb: np.ndarray) -> tuple[np.ndarray, float]:
        if self.noise is None:
            self.noise = eb.copy() + 1e-10
            self.smoothed = eb.copy()
            return np.ones(NB_BANDS), 0.0
        self.smoothed = (self.alpha * self.smoothed
                         + (1 - self.alpha) * eb)
        # noise floor: fast decay down, very slow rise
        self.noise = np.where(self.smoothed < self.noise, self.smoothed,
                              self.noise / self.floor_track)
        snr = self.smoothed / (self.noise + 1e-10)
        # Wiener-style gain with oversubtraction: bands at the noise
        # floor (snr ~ 1) collapse to min_gain, strong bands pass
        gains = np.clip(1.0 - 2.0 / np.maximum(snr, 1e-3),
                        self.min_gain, 1.0)
        # VAD heuristic: energy of mid bands well above the floor
        voiced_snr = float(np.mean(snr[2:16]))
        vad = float(np.clip((voiced_snr - 1.5) / 8.0, 0.0, 1.0))
        return gains, vad

    def reset(self):
        self.noise = None
        self.smoothed = None


@dataclass
class GruLayer:
    """RNNoise GRU cell weights (input, recurrent, bias) with the
    rnnoise activation layout."""

    W: np.ndarray   # (3*units, inputs)
    U: np.ndarray   # (3*units, units)
    b: np.ndarray   # (3*units,)
    activation: str = "relu"

    @property
    def units(self) -> int:
        return self.U.shape[1]

    def step(self, h: np.ndarray, x: np.ndarray) -> np.ndarray:
        n = self.units
        zrh = self.W @ x + self.b
        rec = self.U @ h
        z = _sigmoid(zrh[:n] + rec[:n])
        r = _sigmoid(zrh[n:2 * n] + rec[n:2 * n])
        hh = zrh[2 * n:] + r * rec[2 * n:]
        hh = np.tanh(hh) if self.activation == "tanh" else np.maximum(hh, 0)
        return z * h + (1 - z) * hh


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class GruModel:
    """RNNoise network: input dense(24, tanh) -> vad GRU(24) ->
    noise GRU(48) -> denoise GRU(96) -> gains dense(22, sigmoid),
    vad dense(1, sigmoid). Weights from an .npz with keys
    input_dense_{W,b}, vad_gru_{W,U,b}, noise_gru_{W,U,b},
    denoise_gru_{W,U,b}, denoise_output_{W,b}, vad_output_{W,b}."""

    N_FEATURES = 42

    def __init__(self, weights: dict):
        w = weights
        self.dense_W = w["input_dense_W"]
        self.dense_b = w["input_dense_b"]
        self.vad_gru = GruLayer(w["vad_gru_W"], w["vad_gru_U"],
                                w["vad_gru_b"])
        self.noise_gru = GruLayer(w["noise_gru_W"], w["noise_gru_U"],
                                  w["noise_gru_b"])
        self.denoise_gru = GruLayer(w["denoise_gru_W"], w["denoise_gru_U"],
                                    w["denoise_gru_b"])
        self.out_W = w["denoise_output_W"]
        self.out_b = w["denoise_output_b"]
        self.vad_W = w["vad_output_W"]
        self.vad_b = w["vad_output_b"]
        self.reset()

    @classmethod
    def load(cls, path: str) -> "GruModel":
        return cls(dict(np.load(path)))

    def reset(self):
        self.h_vad = np.zeros(self.vad_gru.units)
        self.h_noise = np.zeros(self.noise_gru.units)
        self.h_denoise = np.zeros(self.denoise_gru.units)

    def frame_gains(self, features: np.ndarray) -> tuple[np.ndarray, float]:
        d = np.tanh(self.dense_W @ features + self.dense_b)
        self.h_vad = self.vad_gru.step(self.h_vad, d)
        vad = float(_sigmoid(self.vad_W @ self.h_vad + self.vad_b)[0])
        noise_in = np.concatenate([d, self.h_vad, features])
        self.h_noise = self.noise_gru.step(self.h_noise, noise_in)
        dn_in = np.concatenate([self.h_vad, self.h_noise, features])
        self.h_denoise = self.denoise_gru.step(self.h_denoise, dn_in)
        gains = _sigmoid(self.out_W @ self.h_denoise + self.out_b)
        return gains, vad


def features_from_bands(eb: np.ndarray, prev1: np.ndarray,
                        prev2: np.ndarray) -> np.ndarray:
    """42-dim feature vector: log band energies (BFCC-ish), first and
    second temporal derivatives, simplified spectral stats."""
    logs = np.log10(eb + 1e-2)
    d1 = logs - prev1
    d2 = logs - 2 * prev1 + prev2
    extra = np.array([float(np.mean(logs)), float(np.std(logs))] + [0.0] * 18)
    feat = np.concatenate([logs, d1[:6], d2[:6], extra[:8]])
    assert feat.shape[0] == 42, feat.shape
    return feat


class DenoiseState:
    """Streaming per-channel denoiser (nnnoiseless DenoiseState
    analogue): feed 480-sample frames, get denoised frames + VAD."""

    def __init__(self, model=None):
        self.window = vorbis_window()
        self.model = model if model is not None else SpectralGate()
        self.analysis_mem = np.zeros(FRAME_SIZE)   # previous input half
        self.synthesis_mem = np.zeros(FRAME_SIZE)  # overlap-add tail
        self.prev_logs1 = np.zeros(NB_BANDS)
        self.prev_logs2 = np.zeros(NB_BANDS)

    def process_frame(self, x: np.ndarray) -> tuple[np.ndarray, float]:
        """x: (480,) float in [-1, 1]; returns (denoised, vad)."""
        buf = np.concatenate([self.analysis_mem, x])
        self.analysis_mem = x.copy()
        spec = np.fft.rfft(buf * self.window)
        eb = band_energies(spec)

        if isinstance(self.model, GruModel):
            feats = features_from_bands(eb, self.prev_logs1,
                                        self.prev_logs2)
            self.prev_logs2 = self.prev_logs1
            self.prev_logs1 = np.log10(eb + 1e-2)
            gains, vad = self.model.frame_gains(feats)
        else:
            gains, vad = self.model.frame_gains(eb)

        g = interp_band_gain(gains)
        out_spec = spec * g
        frame = np.fft.irfft(out_spec) * self.window
        out = frame[:FRAME_SIZE] + self.synthesis_mem
        self.synthesis_mem = frame[FRAME_SIZE:]
        return out, vad

    def reset(self):
        self.analysis_mem[:] = 0
        self.synthesis_mem[:] = 0
        if hasattr(self.model, "reset"):
            self.model.reset()
