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


_DCT22 = None


def _dct_matrix(n: int = NB_BANDS) -> np.ndarray:
    """Orthonormal DCT-II (rnnoise's dct() over band energies)."""
    global _DCT22
    if _DCT22 is None or _DCT22.shape[0] != n:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * k * (i + 0.5) / n) * np.sqrt(2.0 / n)
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT22 = m
    return _DCT22


CEPS_MEM = 8
PITCH_MIN = 60            # ~800 Hz
PITCH_MAX = 768           # ~62 Hz (rnnoise PITCH_MAX_PERIOD)


class FeatureExtractor:
    """The RNNoise 42-feature frontend layout
    (audio/audiofx/src/audiornnoise via the nnnoiseless crate):

      [0..21]  BFCC — DCT-II of log10 band energies (cepstrum)
      [22..27] first temporal derivative of BFCC 0..5
      [28..33] second temporal derivative of BFCC 0..5
      [34..39] DCT of the per-band pitch correlation, first 6
      [40]     pitch period (normalized)
      [41]     spectral variability over the cepstral history

    Deviation note: the pitch estimator here is a plain normalized
    autocorrelation search over [PITCH_MIN, PITCH_MAX) instead of the
    reference's two-pass downsampled search with comb rejection —
    published rnnoise weights therefore need the matching frontend;
    the architecture (shapes, feature semantics) is exact and any
    weight set trained against THIS frontend is plug-in.
    """

    def __init__(self):
        self.ceps_hist = np.zeros((CEPS_MEM, NB_BANDS))
        self.hist_pos = 0
        self.pitch_buf = np.zeros(PITCH_MAX + WINDOW_SIZE)
        self.window = vorbis_window()

    def _pitch(self, frame: np.ndarray) -> tuple[int, float]:
        buf = self.pitch_buf
        buf[:-FRAME_SIZE] = buf[FRAME_SIZE:]
        buf[-FRAME_SIZE:] = frame
        x = buf[-WINDOW_SIZE:]
        xe = float(np.dot(x, x)) + 1e-6

        def score(t):
            y = buf[-WINDOW_SIZE - t:-t]
            c = float(np.dot(x, y))
            ye = float(np.dot(y, y)) + 1e-6
            return c / np.sqrt(xe * ye)

        best_t, best_c = PITCH_MIN, 0.0
        for t in range(PITCH_MIN, PITCH_MAX, 4):
            s = score(t)
            if s > best_c:
                best_c, best_t = s, t
        # submultiple check: a periodic signal correlates equally at
        # k*T; prefer the shortest lag that explains the signal
        for k in (4, 3, 2):
            t2 = best_t // k
            if t2 >= PITCH_MIN:
                s2 = score(t2)
                if s2 > 0.85 * best_c:
                    best_c, best_t = s2, t2
                    break
        return best_t, best_c

    def features(self, spec: np.ndarray, eb: np.ndarray,
                 frame: np.ndarray) -> np.ndarray:
        logs = np.log10(eb + 1e-2)
        ceps = _dct_matrix() @ logs
        hist = self.ceps_hist
        prev1 = hist[(self.hist_pos - 1) % CEPS_MEM]
        prev2 = hist[(self.hist_pos - 2) % CEPS_MEM]
        d1 = ceps[:6] - prev1[:6]
        d2 = ceps[:6] - 2 * prev1[:6] + prev2[:6]
        hist[self.hist_pos % CEPS_MEM] = ceps
        self.hist_pos += 1

        # pitch correlation per band: correlate the spectrum with the
        # pitch-delayed window's spectrum
        period, corr = self._pitch(frame)
        delayed = self.pitch_buf[-WINDOW_SIZE - period:-period]
        pspec = np.fft.rfft(delayed * self.window)
        num = band_energies_cross(spec, pspec)
        den = np.sqrt(band_energies(spec)
                      * band_energies(pspec)) + 1e-6
        band_corr = np.clip(num / den, -1.0, 1.0)
        pitch_dct = (_dct_matrix() @ band_corr)[:6]

        # spectral variability: mean over history of the min distance
        # to other history entries (rnnoise spec_variability)
        n = min(self.hist_pos, CEPS_MEM)
        var = 0.0
        if n > 1:
            h = hist[:n]
            d = ((h[:, None, :] - h[None, :, :]) ** 2).sum(-1)
            d += np.eye(n) * 1e9
            var = float(np.mean(d.min(axis=1)))

        feat = np.concatenate([
            ceps, d1, d2, pitch_dct,
            [0.01 * (period - 300), var / 100.0]])
        assert feat.shape[0] == 42, feat.shape
        return feat

    def reset(self):
        self.ceps_hist[:] = 0
        self.hist_pos = 0
        self.pitch_buf[:] = 0


def band_energies_cross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cross band energies Re(a * conj(b)) (compute_band_corr)."""
    e = np.zeros(a.shape[:-1] + (NB_BANDS,))
    p = (a * np.conj(b)).real
    for band in range(NB_BANDS - 1):
        lo, hi = BAND_EDGES[band], BAND_EDGES[band + 1]
        size = hi - lo
        frac = np.arange(size) / size
        seg = p[..., lo:hi]
        e[..., band] += np.sum(seg * (1 - frac), axis=-1)
        e[..., band + 1] += np.sum(seg * frac, axis=-1)
    e[..., 0] *= 2
    e[..., -1] *= 2
    return e


class DenoiseState:
    """Streaming per-channel denoiser (nnnoiseless DenoiseState
    analogue): feed 480-sample frames, get denoised frames + VAD."""

    def __init__(self, model=None):
        self.window = vorbis_window()
        self.model = model if model is not None else SpectralGate()
        self.analysis_mem = np.zeros(FRAME_SIZE)   # previous input half
        self.synthesis_mem = np.zeros(FRAME_SIZE)  # overlap-add tail
        self.feat = FeatureExtractor()

    def process_frame(self, x: np.ndarray) -> tuple[np.ndarray, float]:
        """x: (480,) float in [-1, 1]; returns (denoised, vad)."""
        buf = np.concatenate([self.analysis_mem, x])
        self.analysis_mem = x.copy()
        spec = np.fft.rfft(buf * self.window)
        eb = band_energies(spec)

        if isinstance(self.model, SpectralGate):
            gains, vad = self.model.frame_gains(eb)
        else:
            feats = self.feat.features(spec, eb, x)
            gains, vad = self.model.frame_gains(feats)

        g = interp_band_gain(gains)
        out_spec = spec * g
        frame = np.fft.irfft(out_spec) * self.window
        out = frame[:FRAME_SIZE] + self.synthesis_mem
        self.synthesis_mem = frame[FRAME_SIZE:]
        return out, vad

    def reset(self):
        self.analysis_mem[:] = 0
        self.synthesis_mem[:] = 0
        self.feat.reset()
        if hasattr(self.model, "reset"):
            self.model.reset()


# ---------------------------------------------------------------------------
# device (jax) GRU engine
# ---------------------------------------------------------------------------

class JaxGruModel:
    """The same RNNoise network as GruModel, as a jitted JAX step —
    the device engine (batched over streams for the DeviceContext
    path; B=1 when used per element instance).  Architecture-parity
    with the numpy oracle is tested to fp tolerance in
    tests/test_rnnoise.py (the two differ only in matmul reduction
    order)."""

    def __init__(self, weights: dict, dtype="float32"):
        import jax
        import jax.numpy as jnp
        w = {k: jnp.asarray(np.asarray(v), dtype)
             for k, v in weights.items()}
        n_vad = w["vad_gru_U"].shape[1]
        n_noise = w["noise_gru_U"].shape[1]
        n_den = w["denoise_gru_U"].shape[1]
        self._sizes = (n_vad, n_noise, n_den)
        self._dtype = dtype

        def gru_step(name, h, x, act):
            W, U, b = w[f"{name}_W"], w[f"{name}_U"], w[f"{name}_b"]
            n = U.shape[1]
            zrh = x @ W.T + b
            rec = h @ U.T
            z = jax.nn.sigmoid(zrh[..., :n] + rec[..., :n])
            r = jax.nn.sigmoid(zrh[..., n:2 * n] + rec[..., n:2 * n])
            hh = zrh[..., 2 * n:] + r * rec[..., 2 * n:]
            hh = jnp.tanh(hh) if act == "tanh" else jnp.maximum(hh, 0)
            return z * h + (1 - z) * hh

        @jax.jit
        def step(hs, feats):
            """hs: (h_vad (B,24), h_noise (B,48), h_den (B,96));
            feats: (B, 42) -> (hs, gains (B,22), vad (B,))."""
            h_vad, h_noise, h_den = hs
            d = jnp.tanh(feats @ w["input_dense_W"].T
                         + w["input_dense_b"])
            h_vad = gru_step("vad_gru", h_vad, d, "relu")
            vad = jax.nn.sigmoid(h_vad @ w["vad_output_W"].T
                                 + w["vad_output_b"])[..., 0]
            noise_in = jnp.concatenate([d, h_vad, feats], axis=-1)
            h_noise = gru_step("noise_gru", h_noise, noise_in, "relu")
            dn_in = jnp.concatenate([h_vad, h_noise, feats], axis=-1)
            h_den = gru_step("denoise_gru", h_den, dn_in, "relu")
            gains = jax.nn.sigmoid(h_den @ w["denoise_output_W"].T
                                   + w["denoise_output_b"])
            return (h_vad, h_noise, h_den), gains, vad

        self._step = step
        self.reset()

    @classmethod
    def load(cls, path: str, dtype="float32") -> "JaxGruModel":
        return cls(dict(np.load(path)), dtype)

    def reset(self, batch: int = 1):
        import jax.numpy as jnp
        n_vad, n_noise, n_den = self._sizes
        self._h = (jnp.zeros((batch, n_vad), self._dtype),
                   jnp.zeros((batch, n_noise), self._dtype),
                   jnp.zeros((batch, n_den), self._dtype))

    def frame_gains(self, features: np.ndarray):
        """Streaming single-stream API (GruModel-compatible)."""
        import jax.numpy as jnp
        self._h, gains, vad = self._step(
            self._h, jnp.asarray(features, self._dtype)[None])
        return np.asarray(gains[0], np.float64), float(vad[0])

    def batch_step(self, feats_b):
        """(B, 42) batched step for the DeviceContext path."""
        self._h, gains, vad = self._step(self._h, feats_b)
        return gains, vad


# ---------------------------------------------------------------------------
# fully-device denoiser (DeviceContext execution path)
# ---------------------------------------------------------------------------

def _band_matrix() -> np.ndarray:
    """(FREQ_SIZE, NB_BANDS) triangular weights: band_energies(p) ==
    p @ W (the loops above as one matmul — MXU-friendly)."""
    W = np.zeros((FREQ_SIZE, NB_BANDS))
    for b in range(NB_BANDS - 1):
        lo, hi = BAND_EDGES[b], BAND_EDGES[b + 1]
        frac = np.arange(hi - lo) / (hi - lo)
        W[lo:hi, b] += 1 - frac
        W[lo:hi, b + 1] += frac
    W[:, 0] *= 2
    W[:, -1] *= 2
    return W


def _interp_matrix() -> np.ndarray:
    """(NB_BANDS, FREQ_SIZE): interp_band_gain as a matmul."""
    G = np.zeros((NB_BANDS, FREQ_SIZE))
    for b in range(NB_BANDS - 1):
        lo, hi = BAND_EDGES[b], BAND_EDGES[b + 1]
        frac = np.arange(hi - lo) / (hi - lo)
        G[b, lo:hi] = 1 - frac
        G[b + 1, lo:hi] = frac
    G[-1, BAND_EDGES[-1]:] = 1.0
    return G


def make_device_denoiser(frames_per_block: int = 10,
                         alpha: float = 0.95,
                         floor_track: float = 0.9995,
                         min_gain: float = 0.05):
    """Batched device twin of DenoiseState with the SpectralGate
    model (the element's default engine): STFT -> band energies (one
    matmul) -> noise-floor tracking -> Wiener band gains -> gain
    interpolation (matmul) -> iSTFT overlap-add, as a lax.scan over
    `frames_per_block` frames per dispatch.

    init(batch) -> state;  step(state, x (B, frames*480))
        -> (state, out (B, frames*480), vads (B, frames))
    Math follows SpectralGate.frame_gains / DenoiseState.process_frame
    above operation-for-operation (f64), so batched-vs-host parity is
    at the fp-reassociation level.
    """
    import jax
    import jax.numpy as jnp

    win = jnp.asarray(vorbis_window())
    Wb = jnp.asarray(_band_matrix())
    Gi = jnp.asarray(_interp_matrix())

    def init(batch: int) -> dict:
        z = lambda *s: jnp.zeros(s, jnp.float64)  # noqa: E731
        return dict(analysis=z(batch, FRAME_SIZE),
                    synth=z(batch, FRAME_SIZE),
                    noise=z(batch, NB_BANDS),
                    smoothed=z(batch, NB_BANDS),
                    started=jnp.zeros(batch, bool),
                    vad=z(batch))

    def frame(st, x):
        buf = jnp.concatenate([st["analysis"], x], axis=1)
        spec = jnp.fft.rfft(buf * win)
        p = jnp.abs(spec) ** 2
        eb = p @ Wb
        started = st["started"]
        # init frame: noise := eb + 1e-10, smoothed := eb, NO floor
        # update (SpectralGate.frame_gains first-call semantics)
        sm_upd = alpha * st["smoothed"] + (1 - alpha) * eb
        smoothed = jnp.where(started[:, None], sm_upd, eb)
        noise_upd = jnp.where(sm_upd < st["noise"], sm_upd,
                              st["noise"] / floor_track)
        noise = jnp.where(started[:, None], noise_upd, eb + 1e-10)
        snr = smoothed / (noise + 1e-10)
        gains = jnp.clip(1.0 - 2.0 / jnp.maximum(snr, 1e-3),
                         min_gain, 1.0)
        gains = jnp.where(started[:, None], gains, 1.0)
        voiced = jnp.mean(snr[:, 2:16], axis=1)
        vad = jnp.where(started,
                        jnp.clip((voiced - 1.5) / 8.0, 0.0, 1.0), 0.0)
        g = gains @ Gi
        fr = jnp.fft.irfft(spec * g) * win
        out = fr[:, :FRAME_SIZE] + st["synth"]
        st = dict(st, analysis=x, synth=fr[:, FRAME_SIZE:],
                  noise=noise, smoothed=smoothed,
                  started=jnp.ones_like(started), vad=vad)
        return st, out

    @jax.jit
    def step(st, xb):
        B = xb.shape[0]
        xs = xb.reshape(B, -1, FRAME_SIZE)
        xs = jnp.moveaxis(xs, 1, 0)          # (F, B, 480)

        def body(st, xk):
            st, out = frame(st, xk)
            return st, (out, st["vad"])

        st, (outs, vads) = jax.lax.scan(body, st, xs)
        out = jnp.moveaxis(outs, 0, 1).reshape(B, -1)
        return st, out, jnp.moveaxis(vads, 0, 1)    # (B, F)

    return step, init


# ---------------------------------------------------------------------------
# fully-device GRU denoiser (DeviceContext execution path, weights set)
# ---------------------------------------------------------------------------

def make_device_gru_denoiser(weights: dict, frames_per_block: int = 10,
                             dtype=None):
    """Batched device twin of DenoiseState with the RNNoise GRU model:
    the WHOLE per-frame chain — STFT, band energies, 42-feature
    frontend (BFCC + deltas, pitch search/correlation, spectral
    variability), GRU stack, band-gain interpolation, iSTFT
    overlap-add — as a lax.scan over `frames_per_block` frames, N
    streams per dispatch.

    Math mirrors FeatureExtractor/DenoiseState/GruModel above
    operation-for-operation in f64 (reference architecture:
    audio/audiofx/src/audiornnoise/imp.rs via the nnnoiseless crate);
    host-vs-device parity is tested in tests/test_rnnoise_device.py.
    The pitch correlation search runs as one grouped convolution per
    frame (the sliding dot products never materialize), which is what
    makes the frontend batch cleanly onto the MXU.

    init(batch) -> state;  step(state, x (B, frames*480) SCALED
    [-32767, 32767]) -> (state, out (B, frames*480), vads (B, frames))

    dtype: jnp.float64 (default; bit-tight parity with the host
    oracle on CPU) or jnp.float32 — the TPU production precision (the
    reference RNNoise/nnnoiseless pipeline is itself f32; f64 FFTs
    and grouped convs do not lower well on TPU).
    """
    import jax
    import jax.numpy as jnp

    f64 = dtype or jnp.float64
    win = jnp.asarray(vorbis_window(), f64)
    Wb = jnp.asarray(_band_matrix(), f64)
    Gi = jnp.asarray(_interp_matrix(), f64)
    Dct = jnp.asarray(_dct_matrix(), f64)
    w = {k: jnp.asarray(np.asarray(v), f64) for k, v in weights.items()}
    L = PITCH_MAX + WINDOW_SIZE          # pitch buffer length (1728)
    lags = np.arange(PITCH_MIN, PITCH_MAX)          # all t, full res
    # c_all[s] = dot(buf[s:s+960], x); lag t starts at s = L-960-t
    s_idx = jnp.asarray(PITCH_MAX - lags)
    n_vad = np.asarray(weights["vad_gru_U"]).shape[1]
    n_noise = np.asarray(weights["noise_gru_U"]).shape[1]
    n_den = np.asarray(weights["denoise_gru_U"]).shape[1]

    def gru(name, h, x, act="relu"):
        W, U, b = w[f"{name}_W"], w[f"{name}_U"], w[f"{name}_b"]
        n = U.shape[1]
        zrh = x @ W.T + b
        rec = h @ U.T
        z = jax.nn.sigmoid(zrh[..., :n] + rec[..., :n])
        r = jax.nn.sigmoid(zrh[..., n:2 * n] + rec[..., n:2 * n])
        hh = zrh[..., 2 * n:] + r * rec[..., 2 * n:]
        hh = jnp.tanh(hh) if act == "tanh" else jnp.maximum(hh, 0.0)
        return z * h + (1 - z) * hh

    def init(batch: int) -> dict:
        z = lambda *s: jnp.zeros(s, f64)  # noqa: E731
        return dict(analysis=z(batch, FRAME_SIZE),
                    synth=z(batch, FRAME_SIZE),
                    pitch=z(batch, L),
                    ceps_hist=z(batch, CEPS_MEM, NB_BANDS),
                    hist_pos=jnp.zeros(batch, jnp.int32),
                    h_vad=z(batch, n_vad),
                    h_noise=z(batch, n_noise),
                    h_den=z(batch, n_den),
                    vad=z(batch))

    def pitch_search(pbuf):
        """FeatureExtractor._pitch, batched: grid argmax over
        normalized autocorrelation + submultiple preference."""
        B = pbuf.shape[0]
        x = pbuf[:, -WINDOW_SIZE:]
        xe = jnp.sum(x * x, axis=1) + 1e-6
        # c_all[s] = dot(buf[s:s+960], x): one grouped correlation
        # (XLA "convolution" IS cross-correlation — no kernel flip)
        c_all = jax.lax.conv_general_dilated(
            pbuf[None], x[:, None, :],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=B)[0]              # (B, L-960+1)
        # sliding window energies via cumulative sums
        c2 = jnp.cumsum(pbuf * pbuf, axis=1)
        c2 = jnp.concatenate([jnp.zeros((B, 1), f64), c2], axis=1)
        ye_all = c2[:, WINDOW_SIZE:] - c2[:, :-WINDOW_SIZE] + 1e-6
        c_t = c_all[:, s_idx]                       # by lag t
        ye_t = ye_all[:, s_idx]
        scores = c_t / jnp.sqrt(xe[:, None] * ye_t)
        grid = scores[:, ::4]                       # t = 60, 64, ...
        gi = jnp.argmax(grid, axis=1)
        bt0 = PITCH_MIN + 4 * gi
        bc0 = jnp.take_along_axis(grid, gi[:, None], 1)[:, 0]
        bt, bc = bt0, bc0
        taken = jnp.zeros_like(bt0, bool)
        for k in (4, 3, 2):                # first success wins (host)
            t2 = bt0 // k
            idx = jnp.clip(t2 - PITCH_MIN, 0, len(lags) - 1)
            s2 = jnp.take_along_axis(scores, idx[:, None], 1)[:, 0]
            cond = (t2 >= PITCH_MIN) & ~taken & (s2 > 0.85 * bc0)
            bt = jnp.where(cond, t2, bt)
            bc = jnp.where(cond, s2, bc)
            taken = taken | cond
        return bt

    def features(st, spec, eb, x, pbuf):
        B = x.shape[0]
        logs = jnp.log10(eb + 1e-2)
        ceps = logs @ Dct.T
        pos = st["hist_pos"]
        hist = st["ceps_hist"]
        take = lambda p: jnp.take_along_axis(   # noqa: E731
            hist, (p % CEPS_MEM)[:, None, None], 1)[:, 0]
        prev1 = take(pos - 1)
        prev2 = take(pos - 2)
        d1 = ceps[:, :6] - prev1[:, :6]
        d2 = ceps[:, :6] - 2 * prev1[:, :6] + prev2[:, :6]
        slot = jax.nn.one_hot(pos % CEPS_MEM, CEPS_MEM, dtype=f64)
        hist = (hist * (1 - slot[:, :, None])
                + slot[:, :, None] * ceps[:, None, :])
        pos = pos + 1

        period = pitch_search(pbuf)
        start = L - WINDOW_SIZE - period
        delayed = jax.vmap(
            lambda b, s: jax.lax.dynamic_slice(b, (s,), (WINDOW_SIZE,))
        )(pbuf, start)
        pspec = jnp.fft.rfft(delayed * win)
        num = (spec * jnp.conj(pspec)).real @ Wb
        den = jnp.sqrt(eb * ((jnp.abs(pspec) ** 2) @ Wb)) + 1e-6
        band_corr = jnp.clip(num / den, -1.0, 1.0)
        pitch_dct = (band_corr @ Dct.T)[:, :6]

        # spectral variability over the valid history rows
        n = jnp.minimum(pos, CEPS_MEM)              # (B,)
        valid = (jnp.arange(CEPS_MEM)[None, :]
                 < n[:, None])                      # (B, 8)
        diff = hist[:, :, None, :] - hist[:, None, :, :]
        d = jnp.sum(diff * diff, axis=-1)           # (B, 8, 8)
        pair_ok = valid[:, :, None] & valid[:, None, :]
        d = jnp.where(pair_ok, d, 1e9)
        d = d + jnp.eye(CEPS_MEM, dtype=f64) * 1e9
        mins = jnp.min(d, axis=2)                   # (B, 8)
        var = jnp.sum(jnp.where(valid, mins, 0.0), axis=1) \
            / jnp.maximum(n, 1)
        var = jnp.where(n > 1, var, 0.0)

        feat = jnp.concatenate([
            ceps, d1, d2, pitch_dct,
            (0.01 * (period - 300))[:, None].astype(f64),
            (var / 100.0)[:, None]], axis=1)        # (B, 42)
        return dict(st, ceps_hist=hist, hist_pos=pos), feat

    def frame(st, x):
        buf = jnp.concatenate([st["analysis"], x], axis=1)
        spec = jnp.fft.rfft(buf * win)
        eb = (jnp.abs(spec) ** 2) @ Wb
        pbuf = jnp.concatenate([st["pitch"][:, FRAME_SIZE:], x], axis=1)
        st, feat = features(st, spec, eb, x, pbuf)

        d = jnp.tanh(feat @ w["input_dense_W"].T + w["input_dense_b"])
        h_vad = gru("vad_gru", st["h_vad"], d)
        vad = jax.nn.sigmoid(h_vad @ w["vad_output_W"].T
                             + w["vad_output_b"])[:, 0]
        noise_in = jnp.concatenate([d, h_vad, feat], axis=1)
        h_noise = gru("noise_gru", st["h_noise"], noise_in)
        dn_in = jnp.concatenate([h_vad, h_noise, feat], axis=1)
        h_den = gru("denoise_gru", st["h_den"], dn_in)
        gains = jax.nn.sigmoid(h_den @ w["denoise_output_W"].T
                               + w["denoise_output_b"])

        g = gains @ Gi
        fr = jnp.fft.irfft(spec * g) * win
        out = fr[:, :FRAME_SIZE] + st["synth"]
        return dict(st, analysis=x, synth=fr[:, FRAME_SIZE:],
                    pitch=pbuf, h_vad=h_vad, h_noise=h_noise,
                    h_den=h_den, vad=vad), out

    @jax.jit
    def step(st, xb):
        B = xb.shape[0]
        xb = xb.astype(f64)         # device rows may arrive f64/f32
        xs = jnp.moveaxis(xb.reshape(B, -1, FRAME_SIZE), 1, 0)

        def body(st, xk):
            st, out = frame(st, xk)
            return st, (out, st["vad"])

        st, (outs, vads) = jax.lax.scan(body, st, xs)
        out = jnp.moveaxis(outs, 0, 1).reshape(B, -1)
        return st, out, jnp.moveaxis(vads, 0, 1)

    return step, init
