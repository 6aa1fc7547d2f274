"""Fused device pipelines: whole element chains as one jitted step.

The L2' idea from SURVEY.md §7: a chain of BaseTransform-style elements
becomes ONE compiled function — XLA fuses the elementwise stages, the
batch axis carries many streams, and the state is a pytree carried
across blocks. The flagship chain mirrors the reference's audiofx
baseline config: echo -> K-weighted loudness measurement -> gain ->
soft true-peak ceiling.

The loudness stage uses an FIR approximation of the BS.1770
K-weighting (designed from the exact biquad response) evaluated with
the batched overlap-save rFFT kernel: unlike the sequential biquad
scan it compiles quickly and maps onto the TPU's strengths. The
conformance-grade biquad path lives in gstpu.ops.{biquad,ebur128} and
is used by the metering elements.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gstpu.ops.biquad import (biquad_coeffs_highpass,
                              biquad_coeffs_shelving)
from gstpu.ops.echo import echo_block, make_state
from gstpu.ops.fftconv import ir_rfft, ols_block


def kweight_fir(rate: int, taps: int = 511) -> np.ndarray:
    """FIR approximation of the K-weighting pre-filter: impulse
    response of the two cascaded biquads, Hann-tapered. Accurate to
    <0.1 dB above ~80 Hz (the truncated tail only affects the deep
    low end)."""
    from scipy.signal import lfilter
    b1, a1 = biquad_coeffs_shelving(rate)
    b2, a2 = biquad_coeffs_highpass(rate)
    imp = np.zeros(taps)
    imp[0] = 1.0
    h = lfilter(b2, a2, lfilter(b1, a1, imp))
    fade = np.ones(taps)
    fade[taps // 2:] = np.hanning(taps)[taps // 2:] * 2
    fade = np.clip(fade, 0, 1)
    return (h * fade).astype(np.float32)


def make_audiofx_exact_chain(channels: int = 2,
                             echo_delay: int = 48_000,
                             max_delay: int = 48_000):
    """The BASELINE audiofx chain with the REAL elements on device:
    rsaudioecho -> audioloudnorm -> ebur128level at 192 kHz F64,
    batched over streams (VERDICT r1 #1).

    The loudnorm stage is gstpu.ops.loudnorm_dev — the same math the
    `audioloudnorm` element runs (bit-exact control flow vs the
    reference algorithm, ledger in that module's docstring); the
    meter is fused into the loudnorm output measurement (one shared
    K-weighting pass — the chain-fusion the L2' runtime promises).
    Echo is the exact f64 segment kernel (gstpu.ops.echo).

    Returns (prime, step, init):
      init(batch) -> state
      prime(state, x (B, 30*19200*C), intensity, feedback)
          -> (state, first out (B, 19200*C))
      step(state, x (B, 19200*C), intensity, feedback)
          -> (state, out, meters{momentary, shortterm} (B,) LUFS)
    echo_delay/max_delay are in flattened (interleaved) samples.
    """
    import jax as _jax
    from gstpu.ops.loudnorm_dev import (FRAME, GAIN_LOOKAHEAD,
                                        LoudnormParams, init_state,
                                        make_steps)

    params = LoudnormParams(channels=channels)
    first_step, inner_step = make_steps(params, with_meter=True)
    C = channels

    def init(batch: int):
        return dict(tail=make_state((batch,), max_delay),
                    ln=init_state(params, batch))

    @_jax.jit
    def prime(state, x, intensity, feedback):
        tail, y = echo_block(state["tail"], x, intensity, feedback,
                             delay=echo_delay)
        ln, out, _meters = first_step(state["ln"], y)
        return dict(tail=tail, ln=ln), out

    @_jax.jit
    def step(state, x, intensity, feedback):
        tail, y = echo_block(state["tail"], x, intensity, feedback,
                             delay=echo_delay)
        ln, out, meters = inner_step(state["ln"], y)
        return dict(tail=tail, ln=ln), out, meters

    n_prime = GAIN_LOOKAHEAD * C
    n_step = FRAME * C
    return prime, step, init, n_prime, n_step


def make_audiofx_chain(rate: int, delay_samples: int,
                       tail_samples: int, block: int = 48000):
    """Returns (step, init_state) for the fused audiofx chain over
    (B, N) blocks of mono-flattened samples.

    step(state, x, intensity, feedback, target_rms) ->
        (state, out, loudness_db)
    """
    fir = kweight_fir(rate)
    L = fir.shape[0]
    from gstpu.ops.fftconv import next_pow2
    nfft = next_pow2(block + L - 1)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, x, intensity, feedback, target_rms):
        tail, hist, smooth_gain = state
        # rfft of the FIR computed in-graph (XLA constant-folds it);
        # avoids shipping complex constants through the device tunnel
        fir_f = jnp.fft.rfft(jnp.asarray(fir), n=nfft)
        # 1) echo (ring-delay feedback, exact f64 internals)
        tail, y = echo_block(tail, x, intensity, feedback,
                             delay=delay_samples)
        # 2) K-weighted energy via batched overlap-save rFFT conv
        hist, k = ols_block(hist, y.astype(jnp.float32), fir_f,
                            ir_len=L)
        energy = jnp.mean(k * k, axis=-1)
        loudness_db = -0.691 + 10.0 * jnp.log10(energy + 1e-12)
        # 3) loudness-driven gain with one-pole smoothing (per stream)
        want = (target_rms / jnp.sqrt(energy + 1e-12)) \
            .astype(jnp.float32)
        smooth_gain = (0.9 * smooth_gain + 0.1 * want) \
            .astype(jnp.float32)
        y = y * smooth_gain[..., None]
        # 4) soft ceiling (smooth true-peak limiter stand-in)
        y = jnp.tanh(y)
        return (tail, hist, smooth_gain), y.astype(x.dtype), loudness_db

    def init_state(batch: int):
        return (make_state((batch,), tail_samples),
                jnp.zeros((batch, L - 1), jnp.float32),
                jnp.ones(batch, jnp.float32))

    return step, init_state
