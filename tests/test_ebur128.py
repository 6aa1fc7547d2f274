"""EBU R 128 meter correctness (gstpu.ops.ebur128).

Validated against spec properties rather than self-referential goldens:
K-weighting frequency response anchors (BS.1770), analytic sine
loudness, gating behavior, LRA of two-level signals.
"""

import numpy as np
import pytest
from scipy.signal import freqz

from gstpu.ops.biquad import biquad_coeffs_highpass, biquad_coeffs_shelving
from gstpu.ops.ebur128 import EbuR128


def kweight_gain_db(freq: float, rate: int) -> float:
    b1, a1 = biquad_coeffs_shelving(rate)
    b2, a2 = biquad_coeffs_highpass(rate)
    w = 2 * np.pi * freq / rate
    _, h1 = freqz(b1, a1, worN=[w])
    _, h2 = freqz(b2, a2, worN=[w])
    return 20 * np.log10(abs(h1[0] * h2[0]))


def test_kweighting_spec_anchors():
    # BS.1770: +0.691 dB at 997 Hz (the -0.691 constant in the loudness
    # formula cancels it), ~+4 dB shelf boost above that at 10 kHz, HP
    # kills DC
    assert abs(kweight_gain_db(997, 48000) - 0.691) < 0.05
    assert abs(kweight_gain_db(10000, 48000) - 4.0) < 0.1
    assert kweight_gain_db(10, 48000) < -20


def sine(freq, seconds, rate, amp, channels):
    t = np.arange(int(seconds * rate)) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    return np.repeat(x[:, None], channels, axis=1)


@pytest.mark.parametrize("rate", [48000, 44100, 192000])
def test_sine_loudness_analytic(rate):
    # stereo 997 Hz sine, amplitude a in both channels:
    # energy = 2 * g * a^2/2;  loudness = -0.691 + 10log10(2g a^2/2)
    a = 0.1
    m = EbuR128(2, rate)
    m.add_frames(sine(997.0, 5.0, rate, a, 2))
    g = 10 ** (kweight_gain_db(997.0, rate) / 10)
    expected = -0.691 + 10 * np.log10(2 * g * a * a / 2)
    assert abs(m.loudness_global() - expected) < 0.2
    assert abs(m.loudness_shortterm() - expected) < 0.2
    assert abs(m.loudness_momentary() - expected) < 0.2


def test_gating_excludes_silence():
    rate = 48000
    m = EbuR128(1, rate)
    m.add_frames(sine(997.0, 4.0, rate, 0.1, 1))
    loud_only = m.loudness_global()
    m.add_frames(np.zeros((rate * 4, 1)))
    # absolute gate drops the silence blocks entirely (only the
    # sine->silence boundary blocks remain, slightly lowering the mean)
    assert abs(m.loudness_global() - loud_only) < 0.3


def test_relative_gate():
    rate = 48000
    m = EbuR128(1, rate)
    m.add_frames(sine(997.0, 4.0, rate, 0.25, 1))
    loud_only = m.loudness_global()
    # a -35 dB-ish quiet passage: above absolute gate but >10 LU below
    m.add_frames(sine(997.0, 4.0, rate, 0.25 / 100, 1))
    assert abs(m.loudness_global() - loud_only) < 0.3


def test_lra_two_levels():
    rate = 48000
    m = EbuR128(1, rate, frozenset(("I", "S", "LRA", "sample_peak")))
    # 20 s at -20.7ish, 20 s 10 dB lower -> LRA close to 10
    m.add_frames(sine(997.0, 20.0, rate, 0.1, 1))
    m.add_frames(sine(997.0, 20.0, rate, 0.1 / np.sqrt(10), 1))
    assert abs(m.loudness_range() - 10.0) < 1.5


def test_sample_peak():
    rate = 48000
    m = EbuR128(2, rate)
    x = sine(997.0, 0.5, rate, 0.5, 2)
    x[100, 1] = -0.9
    m.add_frames(x)
    assert m.sample_peak(1) == pytest.approx(0.9)
    assert m.sample_peak(0) == pytest.approx(0.5, abs=1e-4)


def test_true_peak_intersample():
    rate = 48000
    # a sine at ~ rate/4 with phase such that samples straddle the peak
    t = np.arange(rate) / rate
    x = 0.5 * np.sin(2 * np.pi * 11997.0 * t + 0.3)
    m = EbuR128(1, rate)
    m.add_frames(x[:, None])
    tp = m.true_peak(0)
    sp = m.sample_peak(0)
    assert tp >= sp - 1e-12
    assert abs(tp - 0.5) < 0.02  # finds the inter-sample peak


def test_momentary_needs_400ms():
    m = EbuR128(1, 48000)
    m.add_frames(sine(997.0, 0.3, 48000, 0.1, 1))
    assert m.loudness_momentary() == float("-inf")
    m.add_frames(sine(997.0, 0.2, 48000, 0.1, 1))
    assert m.loudness_momentary() > -30


def test_reset():
    m = EbuR128(1, 48000)
    m.add_frames(sine(997.0, 1.0, 48000, 0.5, 1))
    m.reset()
    assert m.sample_peak(0) == 0.0
    assert m.loudness_global() == float("-inf")
