"""Device-resident audioloudnorm: the REAL EBU R 128 streaming
normalizer math (reference audio/audiofx/src/audioloudnorm/imp.rs,
mirrored by gstpu/elements/audio/loudnorm.py) as batched JAX over
(B, frame, channels) blocks — gain state machine as carried pytree
state, true-peak limiter as a batched while_loop segment machine,
K-weighting as exact block state-space biquads (gstpu.ops.biquad.
make_block_biquad).

This is ONE implementation shared by the `audioloudnorm` element's
DeviceContext execution path (elements/audio/loudnorm.py
device_batch_spec — chains of pipelines batch through it via
runtime/device_batch.py) and the batched bench/parallel chain
(parallel/chains.py, bench.py): element == chain bit-identity is
structural, not asserted.

Exactness ledger (vs the host numpy element, which is sample-exact
against the literal reference transcription in tests/literal_loudnorm):

* identical control flow: frame-type machine, limiter state machine
  (Out/Attack/Sustain/Release), peak detection positions, gating
  decisions are branch-for-branch the reference algorithm
  (imp.rs:845-1437 limiter, :532-610 gain, :368-442 first frame);
* summations use a fixed binary-tree order (batch-size invariant);
  numpy uses pairwise summation — ulp-level difference, documented;
* XLA contracts a*b+c to FMA where numpy rounds twice — ulp-level,
  the same documented deviation as the audioecho golden;
* on TPU, f64 is *emulated* (no IEEE f64 ALUs on v5e): elementwise
  ops carry ~1e-14 relative error vs host IEEE f64.  CPU-backend
  outputs of this module agree with the numpy element to FMA/libm
  ulps (tested); TPU outputs agree to the emulation bound (reported
  by bench.py).  Loudness conformance (-24 LUFS +-1 LU, TP <= -2
  dBTP) holds on both by 4+ orders of magnitude of margin.

prev_smp note: the reference tracks prev_smp across detect_peak
calls, but its only read feeds the candidate at scan position 0,
which is unconditionally discarded (`n > 0` requirement,
imp.rs:1441-1470); it is provably dead for detection and not carried
here.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gstpu.ops.biquad import (_tree_sum_last, biquad_coeffs_highpass,
                              biquad_coeffs_shelving, make_block_biquad)

# reference imp.rs:207-214 (192 kHz)
RATE = 192_000
FRAME = 19_200                 # 100 ms
LOOKAHEAD = 1_920              # limiter lookahead, 10 ms
ATTACK = 1_920                 # limiter attack window
RELEASE = 19_200               # limiter release window
GAIN_LOOKAHEAD = 30 * FRAME    # 3 s
LIM = 2 * FRAME + LOOKAHEAD    # limiter window samples
ABSW = FRAME + LOOKAHEAD + 12  # |.| window needed per limiter frame
NPEAK = FRAME + LOOKAHEAD + 1  # candidate positions [0, NPEAK)

OUT, ATT, SUS, REL = 0, 1, 2, 3

# 10^((-70 + 0.691) / 10): absolute gate block energy (BS.1770)
ABS_THRESHOLD_ENERGY = 10.0 ** ((-70.0 + 0.691) / 10.0)
REL_GATE_FACTOR = 10.0 ** (-10.0 / 10.0)


def _gaussian_weights() -> np.ndarray:
    """21-tap gaussian, sigma 3.5, normalized (imp.rs:1893-1914)."""
    sigma = 3.5
    x = np.arange(21, dtype=np.float64) - 10.0
    w = (1.0 / (sigma * np.sqrt(2.0 * np.pi))) * np.exp(
        -(x ** 2) / (2 * sigma ** 2))
    return w / w.sum()


def _channel_weights(channels: int) -> np.ndarray:
    w = np.ones(channels)
    if channels > 3:
        w[3] = 0.0
        for i in range(4, min(channels, 6)):
            w[i] = 1.41
    return w


@dataclass(frozen=True)
class LoudnormParams:
    channels: int = 2
    loudness_target: float = -24.0
    loudness_range_target: float = 7.0
    max_true_peak: float = -2.0
    max_blocks: int = 4096      # gating history cap (409.6 s); the
    # host element is unbounded — saturation drops newest blocks and
    # is reported via state["bcount"] for callers that care.

    @property
    def target_tp(self) -> float:
        return 10.0 ** (self.max_true_peak / 20.0)


def init_state(params: LoudnormParams, batch: int,
               offset_db: float = 0.0) -> dict:
    """offset_db is a runtime value (state["offset"]), not a compile
    key: changing it reuses the jitted steps."""
    C = params.channels
    f64 = jnp.float64
    z = lambda *s: jnp.zeros(s, f64)  # noqa: E731
    return dict(
        # input measurement (two cascaded K-weighting biquads)
        z_in1=z(batch * C, 2), z_in2=z(batch * C, 2),
        ring_in=z(batch, 30, C), nsub_in=jnp.int32(0),
        blocks=z(batch, params.max_blocks),
        bcount=jnp.zeros(batch, jnp.int32),
        speak=z(batch, C),
        # output measurement
        z_out1=z(batch * C, 2), z_out2=z(batch * C, 2),
        ring_out=z(batch, 30, C), nsub_out=jnp.int32(0),
        # gain machine (imp.rs State)
        delta=z(batch, 30), gidx=jnp.int32(1),
        prev_delta=z(batch),
        above=jnp.zeros(batch, bool),
        offset=jnp.full(batch, 10.0 ** (offset_db / 20.0),
                        f64),
        # limiter
        lim=z(batch, LIM * C),
        gr0=z(batch), gr1=z(batch),
        lstate=jnp.full(batch, OUT, jnp.int32),
        env_cnt=jnp.zeros(batch, jnp.int32),
        sus=jnp.full(batch, -1, jnp.int32),
        # 3 s gain-lookahead delay line (linear, newest at the end)
        dbuf=z(batch, GAIN_LOOKAHEAD * C),
    )


# ---------------------------------------------------------------------------
# measurement core
# ---------------------------------------------------------------------------

def _make_measure(params: LoudnormParams):
    b1, a1 = biquad_coeffs_shelving(RATE)
    b2, a2 = biquad_coeffs_highpass(RATE)
    bq1 = make_block_biquad(b1, a1, L=64)
    bq2 = make_block_biquad(b2, a2, L=64)
    C = params.channels
    wts = _channel_weights(C)

    def measure(z1, z2, x_flat):
        """x_flat: (B, n*C) interleaved f64, n a multiple of FRAME.
        -> (z1, z2, subblock energies (B, n//FRAME, C))."""
        B = x_flat.shape[0]
        n = x_flat.shape[1] // C
        xc = x_flat.reshape(B, n, C)
        xt = jnp.transpose(xc, (0, 2, 1)).reshape(B * C, n)
        y, z1 = bq1(xt, z1)
        y, z2 = bq2(y, z2)
        sq = (y * y).reshape(B, C, n // FRAME, FRAME)
        e = _tree_sum_last(sq)                      # (B, C, nsub)
        return z1, z2, jnp.transpose(e, (0, 2, 1))  # (B, nsub, C)

    def window_energy(ring, n_sub: int):
        """Last n_sub subblocks of the 30-ring (oldest-first), per
        reference _window_energy: zero slots pad short histories."""
        w = ring[:, 30 - n_sub:, :]
        per_channel = jnp.zeros_like(w[:, 0, :])
        for i in range(n_sub):                      # defined order
            per_channel = per_channel + w[:, i, :]
        per_channel = per_channel / (n_sub * FRAME)
        e = jnp.zeros_like(per_channel[:, 0])
        for c in range(C):                          # defined order
            e = e + wts[c] * per_channel[:, c]
        return e

    return measure, window_energy


def _loudness(e):
    """-0.691 + 10 log10(e), -inf for e <= 0."""
    safe = jnp.where(e > 0.0, e, 1.0)
    return jnp.where(e > 0.0, -0.691 + 10.0 * jnp.log10(safe),
                     -jnp.inf)


def _gating_append(blocks, bcount, e):
    """Append 400 ms block energy e (B,) where above the absolute
    gate (imp.rs via ebur128 I-mode). Saturates at max_blocks."""
    maxb = blocks.shape[1]
    ok = (e > ABS_THRESHOLD_ENERGY) & (bcount < maxb)
    pos = jnp.clip(bcount, 0, maxb - 1)
    onehot = (jnp.arange(maxb)[None, :] == pos[:, None]) & ok[:, None]
    blocks = jnp.where(onehot, e[:, None], blocks)
    return blocks, bcount + ok.astype(jnp.int32)


def _global_and_threshold(blocks, bcount):
    """(gated 'integrated' loudness, relative threshold)."""
    cnt = bcount.astype(jnp.float64)
    total = _tree_sum_last(blocks)
    mean1 = jnp.where(bcount > 0, total / jnp.where(cnt > 0, cnt, 1.0),
                      0.0)
    rel_th = jnp.where(bcount > 0, _loudness(mean1) - 10.0, -70.0)
    gate = mean1 * REL_GATE_FACTOR
    sel = blocks > gate[:, None]
    gcnt = _tree_sum_last(sel.astype(jnp.float64))
    gsum = _tree_sum_last(jnp.where(sel, blocks, 0.0))
    gmean = jnp.where(gcnt > 0, gsum / jnp.where(gcnt > 0, gcnt, 1.0),
                      0.0)
    global_ = jnp.where((bcount > 0) & (gcnt > 0), _loudness(gmean),
                        -jnp.inf)
    return global_, rel_th


# ---------------------------------------------------------------------------
# gain machine
# ---------------------------------------------------------------------------

_GW = _gaussian_weights()


def _gaussian_filter(delta, gidx):
    """imp.rs:1893-1914 / element gaussian_filter(index)."""
    idx = jnp.where(gidx > 10, gidx - 10, gidx + 20)
    doubled = jnp.concatenate([delta, delta], axis=1)
    d = jax.lax.dynamic_slice(doubled, (jnp.int32(0), idx),
                              (delta.shape[0], 21))
    acc = _GW[0] * d[:, 0]
    for i in range(1, 21):                          # defined order
        acc = acc + _GW[i] * d[:, i]
    return acc


def _update_gain(params: LoudnormParams, st, window_energy, st_out):
    """process_update_gain_inner_frame (imp.rs:532-610).  st_out is
    the output-chain short-term loudness (only read while a stream is
    below threshold)."""
    shortterm = _loudness(window_energy(st["ring_in"], 30))
    global_, rel_th = _global_and_threshold(st["blocks"], st["bcount"])

    above = st["above"]
    grow = (~above) & (shortterm > -70.0)
    prev_delta = jnp.where(grow, st["prev_delta"] * 1.0058,
                           st["prev_delta"])
    above = above | ((~above) & (st_out >= params.loudness_target))

    use_prev = ((shortterm < rel_th) | (shortterm <= -70.0)
                | (~above))
    diff = shortterm - global_
    half_lra = params.loudness_range_target / 2.0
    env_global = jnp.where(
        jnp.abs(diff) < half_lra, diff,
        jnp.where(half_lra * diff < 0.0, -1.0, 1.0))
    env_short = params.loudness_target - shortterm
    dv = jnp.power(10.0, (env_global + env_short) / 20.0)
    new_entry = jnp.where(use_prev, prev_delta, dv)

    delta = jax.lax.dynamic_update_slice(
        st["delta"], new_entry[:, None], (jnp.int32(0), st["gidx"]))
    st = dict(st, delta=delta, prev_delta=new_entry, above=above,
              gidx=(st["gidx"] + 1) % 30)
    return st


# ---------------------------------------------------------------------------
# limiter (imp.rs:845-1437) — batched segment state machine
# ---------------------------------------------------------------------------

def _limiter_frame(params: LoudnormParams, lim, gr0, gr1, lstate,
                   env_cnt, sus, nb):
    """Run the true-peak limiter over the next nb samples of the
    linear limiter window `lim` ((B, LIM*C), newest at the end).
    Returns (lim with envelopes applied, clipped out (B, FRAME*C),
    gr0, gr1, lstate, env_cnt, sus)."""
    C = params.channels
    tp = params.target_tp
    B = lim.shape[0]

    a = jnp.abs(lim[:, :ABSW * C]).reshape(B, ABSW, C)
    V = jnp.max(a, axis=2)                           # (B, ABSW)
    # candidate peaks at positions p in [1, NPEAK) (detect_peak):
    # prev <= this >= next, this > tp, and the 10 samples at p+2..p+11
    # must not exceed this (per channel; row hits if any channel)
    this = a[:, 1:NPEAK, :]
    prev = a[:, 0:NPEAK - 1, :]
    nxt = a[:, 2:NPEAK + 1, :]
    fut = this
    for i in range(2, 12):
        fut = jnp.maximum(fut, a[:, 1 + i:NPEAK + i, :])
    okc = (prev <= this) & (this >= nxt) & (this > tp) & (fut <= this)
    hit = jnp.concatenate(
        [jnp.zeros((B, 1), bool), jnp.any(okc, axis=2)], axis=1)

    iota = jnp.arange(NPEAK, dtype=jnp.int32)
    if64 = jnp.arange(FRAME, dtype=jnp.float64)
    ii32 = jnp.arange(FRAME, dtype=jnp.int32)
    nbi = jnp.asarray(nb, jnp.int32)

    def detect(smp):
        """First peak in the window scanned from smp: positions
        q in (smp + LOOKAHEAD, nb + LOOKAHEAD)."""
        m = hit & (iota[None, :] > (smp + LOOKAHEAD)[:, None]) \
            & (iota[None, :] < (nbi + LOOKAHEAD))
        found = jnp.any(m, axis=1)
        q = jnp.argmax(m, axis=1).astype(jnp.int32)
        pv = jnp.take_along_axis(V, q[:, None], axis=1)[:, 0]
        np_smp = q - LOOKAHEAD                       # peak pos - 10ms
        return found, np_smp, pv

    def body(carry):
        G, gr0, gr1, ls, env, sus, smp = carry
        active = smp < nbi
        found, np_smp, pv = detect(smp)
        found = found & active
        gnew = tp / jnp.where(found, pv, 1.0)
        envf = env.astype(jnp.float64)
        is_out = active & (ls == OUT)
        is_att = active & (ls == ATT)
        is_sus = active & (ls == SUS)
        is_rel = active & (ls == REL)

        # ---- OUT (imp.rs:1338 _limiter_out) --------------------------
        o_smp = jnp.where(found, smp + LOOKAHEAD + np_smp - smp
                          - ATTACK, nbi)
        o_ls = jnp.where(found, ATT, ls)
        o_env = jnp.where(found, 0, env)
        o_sus = jnp.where(found, -1, sus)
        o_gr0 = jnp.where(found, 1.0, gr0)
        o_gr1 = jnp.where(found, gnew, gr1)

        # ---- ATTACK ---------------------------------------------------
        k = jnp.minimum(ATTACK - env, nbi - smp)
        k = jnp.where(found, jnp.minimum(k, np_smp - smp), k)
        k = jnp.maximum(k, 0)
        a_lin_len = k
        a_lin_t0 = envf
        a_lin_diff = gr0 - gr1
        smp1 = smp + k
        env1 = env + k
        env1f = env1.astype(jnp.float64)
        # found: sustain-fill to the attack start point, then peak calc
        a_const_start = smp1
        a_const_len = jnp.where(found, np_smp - smp1, 0)
        smp2 = jnp.where(found, np_smp, smp1)
        lower = found & (gnew < gr1)
        current = gr0 - (env1f / (ATTACK - 1.0)) * (gr0 - gr1)
        old_slope = -(gr0 - gr1)
        new_slope = -(current - gnew)
        steeper = new_slope <= old_slope
        # steeper: restart attack from current; shallower: re-anchor
        safe_slope = jnp.where(old_slope != 0.0, old_slope, 1.0)
        new_end = jnp.maximum((gnew - gr0) / safe_slope, 1.0)
        new_start = new_end - 1.0
        sh_gr0 = gr0 + new_start * old_slope
        cur_pos = jnp.clip((current - sh_gr0) / safe_slope, 0.0, 1.0)
        sh_env = ((ATTACK - 1.0) * cur_pos).astype(jnp.int32)
        a_gr0 = jnp.where(lower, jnp.where(steeper, current, sh_gr0),
                          gr0)
        a_gr1 = jnp.where(lower, gnew, gr1)
        a_env = jnp.where(lower, jnp.where(steeper, 0, sh_env), env1)
        a_sus = jnp.where(
            lower, jnp.where(steeper, -1, sh_env),
            jnp.where(found & (env1 < ATTACK), env1, sus))
        # non-early-exit tail: attack window complete -> sustain
        tail = ~lower & (env1 == ATTACK) & (smp2 < nbi)
        a_ls = jnp.where(lower, ATT, jnp.where(tail, SUS, ls))

        # ---- SUSTAIN --------------------------------------------------
        sc = jnp.where(found, np_smp - smp, sus)
        have = found | (sus >= 0)
        s = jnp.maximum(jnp.minimum(sc, nbi - smp), 0)
        s_const_len = jnp.where(have, s, 0)
        s_smp = jnp.where(have, smp + s, smp)
        s_lower = found & (gnew < gr1)
        s_gr0 = jnp.where(s_lower, gr1, jnp.where(have, gr0, gr1))
        s_gr1 = jnp.where(s_lower, gnew, jnp.where(have, gr1, 1.0))
        sus_dec = sus - s
        s_sus = jnp.where(
            have,
            jnp.where(found,
                      jnp.where(s_lower, -1, LOOKAHEAD),
                      jnp.where(sus_dec == 0, -1, sus_dec)),
            sus)
        s_env = jnp.where(s_lower | ~have, 0, env)
        s_ls = jnp.where(s_lower, ATT, jnp.where(have, ls, REL))

        # ---- RELEASE --------------------------------------------------
        r_current = gr0 - (envf / (RELEASE - 1.0)) * (gr1 - gr0)
        r_lower = found & (gnew < r_current)
        pd = np_smp - smp
        r_const_len = jnp.where(r_lower, jnp.maximum(pd, 0), 0)
        rk = jnp.maximum(jnp.minimum(RELEASE - env, nbi - smp), 0)
        r_lin_len = jnp.where(found, 0, rk)
        r_smp = jnp.where(r_lower, np_smp,
                          jnp.where(found, smp, smp + rk))
        r_env = jnp.where(r_lower, 0, jnp.where(found, env, env + rk))
        r_gr0 = jnp.where(r_lower, r_current, gr0)
        r_gr1 = jnp.where(r_lower, gnew,
                          jnp.where(found, r_current, gr1))
        r_ls = jnp.where(
            r_lower, ATT,
            jnp.where(found, SUS,
                      jnp.where(smp + rk < nbi, OUT, ls)))
        r_sus = jnp.where(r_lower, -1, sus)

        # ---- select by state -----------------------------------------
        def sel(o, at, su, re, base):
            x = jnp.where(is_out, o, base)
            x = jnp.where(is_att, at, x)
            x = jnp.where(is_sus, su, x)
            return jnp.where(is_rel, re, x)

        zero = jnp.zeros_like(smp)
        lin_start = sel(zero, smp, zero, smp, zero)
        lin_len = sel(zero, jnp.where(is_att, a_lin_len, 0), zero,
                      r_lin_len, zero)
        lin_t0 = sel(envf, a_lin_t0, envf, envf, envf)
        lin_denom = jnp.where(is_rel, RELEASE - 1.0, ATTACK - 1.0)
        lin_diff = jnp.where(is_rel, gr1 - gr0, a_lin_diff)
        const_start = sel(zero, a_const_start, smp, smp, zero)
        const_len = sel(zero, a_const_len, s_const_len, r_const_len,
                        zero)

        n_gr0 = sel(o_gr0, a_gr0, s_gr0, r_gr0, gr0)
        n_gr1 = sel(o_gr1, a_gr1, s_gr1, r_gr1, gr1)
        n_ls = sel(o_ls, a_ls, s_ls, r_ls, ls)
        n_env = sel(o_env, a_env, s_env, r_env, env)
        n_sus = sel(o_sus, a_sus, s_sus, r_sus, sus)
        n_smp = sel(o_smp, smp2, s_smp, r_smp, smp)

        # ---- envelope writes into G (disjoint ranges; assignment) ----
        ls_f = lin_start.astype(jnp.float64)
        t = (lin_t0[:, None] + (if64[None, :] - ls_f[:, None])) \
            / lin_denom[:, None]
        lin_vals = gr0[:, None] - t * lin_diff[:, None]
        lmask = (ii32[None, :] >= lin_start[:, None]) \
            & (ii32[None, :] < (lin_start + lin_len)[:, None])
        G = jnp.where(lmask, lin_vals, G)
        cmask = (ii32[None, :] >= const_start[:, None]) \
            & (ii32[None, :] < (const_start + const_len)[:, None])
        G = jnp.where(cmask, gr1[:, None], G)

        return (G, n_gr0, n_gr1, n_ls, n_env, n_sus, n_smp)

    def cond(carry):
        return jnp.any(carry[-1] < nbi)

    G0 = jnp.ones((B, FRAME), jnp.float64)
    smp0 = jnp.zeros(B, jnp.int32)
    G, gr0, gr1, lstate, env_cnt, sus, _ = jax.lax.while_loop(
        cond, body, (G0, gr0, gr1, lstate, env_cnt, sus, smp0))

    genv = jnp.broadcast_to(G[:, :, None],
                            (B, FRAME, C)).reshape(B, FRAME * C)
    head = lim[:, :FRAME * C] * genv
    lim = jnp.concatenate([head, lim[:, FRAME * C:]], axis=1)
    out = jnp.clip(head, -tp, tp)
    return lim, out, gr0, gr1, lstate, env_cnt, sus


def _limiter_first_special(params: LoudnormParams, lim, gr1, lstate,
                           sus):
    """true_peak_limiter_first_frame (imp.rs:845-880): signed max over
    the first LOOKAHEAD+1 samples; prime SUSTAIN if above target."""
    C = params.channels
    seg = lim[:, :(LOOKAHEAD + 1) * C]
    # reference quirk (imp.rs:845-880, mirrored by the numpy element):
    # `if abs(s) > max_ { max_ = s }` keeps the SIGNED value, so a
    # negative interim maximum is displaced by the very next sample.
    # Not expressible as argmax — fold exactly with a scan.
    def fold(m, s):
        return jnp.where(jnp.abs(s) > m, s, m), None
    mx, _ = jax.lax.scan(fold, jnp.zeros(seg.shape[0], seg.dtype),
                         jnp.transpose(seg))
    over = mx > params.target_tp
    lstate = jnp.where(over, SUS, lstate)
    sus = jnp.where(over, LOOKAHEAD, sus)
    gr1 = jnp.where(over, params.target_tp / jnp.where(over, mx, 1.0),
                    gr1)
    return gr1, lstate, sus


# ---------------------------------------------------------------------------
# frame steps
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def make_final_step(params: LoudnormParams):
    """EOS drain (process_final_frame, imp.rs:612-668 + the FINAL
    branch of the drain loop): consume the trailing partial frame and
    emit the whole 3 s gain-lookahead tail through the limiter with
    continuing gain updates — the device twin of the host element's
    FINAL frame, so the DeviceContext execution path drains EOS with
    full semantics instead of truncating the lookahead.

    final(st, src (B, FRAME*C) zero-padded, n_valid scalar) ->
        (st, out (B, 30*FRAME*C) zero-padded, out_valid scalar)
    with out_valid = 29*FRAME + n_valid samples per channel.

    n_valid is a traced scalar: one compile covers every tail length.
    The incomplete input 100 ms block updates NO input measurement
    state (matching ebur128's complete-block semantics) — the input
    chain is never read again after FINAL.
    """
    C = params.channels
    measure, window_energy = _make_measure(params)

    def shift_append(bufm, new, n):
        """Drop n*C from the front of (B, L*C) bufm and append the
        first n*C of `new` (zero-padded to a static width) — dynamic
        n via gather."""
        B, L = bufm.shape
        cat = jnp.concatenate([bufm, new], axis=1)
        idx = jnp.arange(L) + n * C
        return jnp.take(cat, idx, axis=1)

    def meas_out(st, out):
        z1, z2, e = measure(st["z_out1"], st["z_out2"], out)
        ring = st["ring_out"]
        for k in range(e.shape[1]):
            ring = jnp.concatenate([ring[:, 1:, :], e[:, k:k + 1, :]],
                                   axis=1)
        return dict(st, z_out1=z1, z_out2=z2, ring_out=ring,
                    nsub_out=st["nsub_out"] + e.shape[1])

    def gain_update(st):
        st_out = _loudness(window_energy(st["ring_out"], 30))
        return _update_gain(params, st, window_energy, st_out)

    def fill_partial_inner(st, src, n):
        """fill_inner for the trailing n (< FRAME) input samples plus
        fill_final(n, FRAME) completing the first drain frame
        (imp.rs:447-530 with n, then 612-668 from idx=n)."""
        gain = _gaussian_filter(st["delta"], (st["gidx"] + 10) % 30)
        gain_next = _gaussian_filter(st["delta"],
                                     (st["gidx"] + 11) % 30)
        frac = jnp.arange(FRAME, dtype=jnp.float64) / FRAME
        gains = (gain[:, None] + frac[None, :]
                 * (gain_next - gain)[:, None]) * st["offset"][:, None]
        # both the inner part ([0, n)) and the final part ([n, FRAME))
        # use arange(FRAME)/FRAME interpolation with the same gain
        # pair, so one FRAME-wide fill covers the combined step
        read = st["dbuf"][:, LIM * C:(LIM + FRAME) * C]
        B = read.shape[0]
        filled = (read.reshape(B, FRAME, C)
                  * gains[:, :, None]).reshape(B, FRAME * C)
        lim = jnp.concatenate([st["lim"][:, FRAME * C:], filled],
                              axis=1)
        dbuf = shift_append(st["dbuf"], src, FRAME)
        return dict(st, lim=lim, dbuf=dbuf)

    def fill_final_full(st, fs):
        """fill_final(0, fs) for a full-or-partial next drain frame:
        gains over arange(fs)/fs; reads fs samples; when fs < FRAME
        the limiter window additionally drops FRAME-fs stale samples
        (imp.rs drain loop's limiter_buf_index adjustment)."""
        gain = _gaussian_filter(st["delta"], (st["gidx"] + 10) % 30)
        gain_next = _gaussian_filter(st["delta"],
                                     (st["gidx"] + 11) % 30)
        fsf = fs.astype(jnp.float64)
        i = jnp.arange(FRAME, dtype=jnp.float64)
        frac = i / jnp.maximum(fsf, 1.0)
        gains = (gain[:, None] + frac[None, :]
                 * (gain_next - gain)[:, None]) * st["offset"][:, None]
        read = st["dbuf"][:, LIM * C:(LIM + FRAME) * C]
        B = read.shape[0]
        filled = (read.reshape(B, FRAME, C)
                  * gains[:, :, None]).reshape(B, FRAME * C)
        valid = (jnp.arange(FRAME) < fs)
        filled = filled.reshape(B, FRAME, C) \
            * valid[None, :, None]
        filled = filled.reshape(B, FRAME * C)
        # shift lim by FRAME (fs new + (FRAME-fs) stale drop)
        lim = jnp.concatenate([st["lim"][:, FRAME * C:], filled],
                              axis=1)
        dbuf = shift_append(st["dbuf"],
                            jnp.zeros_like(st["dbuf"][:, :FRAME * C]),
                            FRAME)
        return dict(st, lim=lim, dbuf=dbuf)

    def run_limiter(st, nb):
        lim, out, gr0, gr1, ls, env, sus = _limiter_frame(
            params, st["lim"], st["gr0"], st["gr1"], st["lstate"],
            st["env_cnt"], st["sus"], nb)
        return dict(st, lim=lim, gr0=gr0, gr1=gr1, lstate=ls,
                    env_cnt=env, sus=sus), out

    @jax.jit
    def final(st, src, n_valid):
        B = src.shape[0]
        n = jnp.asarray(n_valid, jnp.int32)
        st = fill_partial_inner(st, src, n)
        out = jnp.zeros((B, 30 * FRAME * C), jnp.float64)

        def body(k, carry):
            st, out = carry
            fs = jnp.where(k == 29, n, FRAME)
            st, dst = run_limiter(st, fs)
            out = jax.lax.dynamic_update_slice(
                out, dst, (jnp.zeros((), k.dtype),
                           k * (FRAME * C)))
            # between frames (not after the last): measure + gain +
            # next fill
            def cont(st):
                st = meas_out(st, dst)
                st = gain_update(st)
                nfs = jnp.where(k == 28, n, FRAME)
                return fill_final_full(st, nfs)
            st = jax.lax.cond(k < 29, cont, lambda s: s, st)
            return st, out

        st, out = jax.lax.fori_loop(0, 30, body, (st, out))
        return st, out, 29 * FRAME + n

    return final


@lru_cache(maxsize=None)
def make_meter_step(params: LoudnormParams):
    """Standalone ebur128level device stage (reference audio/audiofx/
    src/ebur128level/imp.rs metering modes M/S/I/sample-peak): a
    passthrough step for DeviceContext chains returning (state, x,
    aux) with aux = dict(momentary, shortterm, global_,
    relative_threshold (B,) LUFS; speak (B, C) linear).

    Wide-capable: x may be any multiple of FRAME*C (needed when the
    stage sits upstream of a priming stage or runs the 3 s prime
    output).  LRA and oversampled true-peak stay host-side (the
    element falls back when those modes are requested)."""
    C = params.channels
    measure, window_energy = _make_measure(params)

    @jax.jit
    def meter_step(st, x):
        z1, z2, e = measure(st["z_in1"], st["z_in2"], x)
        ring, nsub = st["ring_in"], st["nsub_in"]
        blocks, bcount = st["blocks"], st["bcount"]
        for k in range(e.shape[1]):                 # static unroll
            ring = jnp.concatenate([ring[:, 1:, :], e[:, k:k + 1, :]],
                                   axis=1)
            nsub = nsub + 1
            eb = window_energy(ring, 4)
            blocks, bcount = jax.lax.cond(
                nsub >= 4, _gating_append,
                lambda b, c, v: (b, c), blocks, bcount, eb)
        speak = jnp.maximum(
            st["speak"],
            jnp.max(jnp.abs(x.reshape(x.shape[0], -1, C)), axis=1))
        global_, rel_th = _global_and_threshold(blocks, bcount)
        aux = dict(
            momentary=_loudness(window_energy(ring, 4)),
            shortterm=_loudness(window_energy(ring, 30)),
            global_=global_, relative_threshold=rel_th, speak=speak)
        st = dict(st, z_in1=z1, z_in2=z2, ring_in=ring, nsub_in=nsub,
                  blocks=blocks, bcount=bcount, speak=speak)
        return st, x, aux
    return meter_step


def init_meter_state(params: LoudnormParams, batch: int) -> dict:
    C = params.channels
    z = lambda *s: jnp.zeros(s, jnp.float64)  # noqa: E731
    return dict(z_in1=z(batch * C, 2), z_in2=z(batch * C, 2),
                ring_in=z(batch, 30, C), nsub_in=jnp.int32(0),
                blocks=z(batch, params.max_blocks),
                bcount=jnp.zeros(batch, jnp.int32),
                speak=z(batch, C))


@lru_cache(maxsize=None)
def make_steps(params: LoudnormParams, with_meter: bool = False):
    """Returns (first_step, inner_step):

    first_step(state, src (B, GAIN_LOOKAHEAD*C)) -> (state, out
      (B, FRAME*C))  — the 3 s priming frame (process_first_frame).
    inner_step(state, src (B, FRAME*C)) -> (state, out (B, FRAME*C))
      — the steady-state 100 ms frame (process_inner_frame).

    Both are jit-compiled and batched; src is interleaved f64.

    with_meter=True fuses a downstream `ebur128level` into the step:
    the output measurement chain runs unconditionally (it IS the
    meter — one shared K-weighting pass, the fusion the L2' runtime
    promises) and BOTH steps return (state, out, meters) with
    meters = dict(momentary, shortterm (B,) LUFS of the output).
    """
    C = params.channels
    measure, window_energy = _make_measure(params)

    def meas_in_frame(ms, src):
        """One 100 ms frame into the input measurement state subset
        ms = (z1, z2, ring, nsub, blocks, bcount, speak)."""
        z1, z2, ring, nsub, blocks, bcount, speak = ms
        z1, z2, e = measure(z1, z2, src)
        ring = jnp.concatenate([ring[:, 1:, :], e[:, 0:1, :]], axis=1)
        nsub = nsub + 1
        eb = window_energy(ring, 4)
        blocks, bcount = jax.lax.cond(
            nsub >= 4,
            lambda b, c, v: _gating_append(b, c, v),
            lambda b, c, v: (b, c), blocks, bcount, eb)
        speak = jnp.maximum(
            speak,
            jnp.max(jnp.abs(src.reshape(src.shape[0], -1, C)), axis=1))
        return (z1, z2, ring, nsub, blocks, bcount, speak)

    def meas_in(st, src):
        ms = (st["z_in1"], st["z_in2"], st["ring_in"], st["nsub_in"],
              st["blocks"], st["bcount"], st["speak"])
        ms = meas_in_frame(ms, src)
        return dict(st, z_in1=ms[0], z_in2=ms[1], ring_in=ms[2],
                    nsub_in=ms[3], blocks=ms[4], bcount=ms[5],
                    speak=ms[6])

    def meas_in_30(st, src):
        """First frame: 3 s of input as a scan over 30 100 ms chunks
        (bounds the biquad working set to one frame)."""
        B = src.shape[0]
        xs = jnp.transpose(
            src.reshape(B, 30, FRAME * C), (1, 0, 2))
        ms = (st["z_in1"], st["z_in2"], st["ring_in"], st["nsub_in"],
              st["blocks"], st["bcount"], st["speak"])
        ms, _ = jax.lax.scan(
            lambda c, xk: (meas_in_frame(c, xk), None), ms, xs)
        return dict(st, z_in1=ms[0], z_in2=ms[1], ring_in=ms[2],
                    nsub_in=ms[3], blocks=ms[4], bcount=ms[5],
                    speak=ms[6])

    def meas_out(st, out):
        z1, z2, e = measure(st["z_out1"], st["z_out2"], out)
        ring = st["ring_out"]
        for k in range(e.shape[1]):
            ring = jnp.concatenate([ring[:, 1:, :], e[:, k:k + 1, :]],
                                   axis=1)
        return dict(st, z_out1=z1, z_out2=z2, ring_out=ring,
                    nsub_out=st["nsub_out"] + e.shape[1])

    def fill_inner(st, src):
        """process_fill_inner_frame (imp.rs:447-530): read the 100 ms
        window due at the limiter, apply interpolated gain, append the
        new input to the delay line."""
        gain = _gaussian_filter(st["delta"], (st["gidx"] + 10) % 30)
        gain_next = _gaussian_filter(st["delta"], (st["gidx"] + 11) % 30)
        frac = jnp.arange(FRAME, dtype=jnp.float64) / FRAME
        gains = (gain[:, None] + frac[None, :]
                 * (gain_next - gain)[:, None]) * st["offset"][:, None]
        read = st["dbuf"][:, LIM * C:(LIM + FRAME) * C]
        B = read.shape[0]
        filled = (read.reshape(B, FRAME, C)
                  * gains[:, :, None]).reshape(B, FRAME * C)
        lim = jnp.concatenate([st["lim"][:, FRAME * C:], filled],
                              axis=1)
        dbuf = jnp.concatenate([st["dbuf"][:, FRAME * C:], src],
                               axis=1)
        return dict(st, lim=lim, dbuf=dbuf)

    def run_limiter(st, nb):
        lim, out, gr0, gr1, ls, env, sus = _limiter_frame(
            params, st["lim"], st["gr0"], st["gr1"], st["lstate"],
            st["env_cnt"], st["sus"], nb)
        return dict(st, lim=lim, gr0=gr0, gr1=gr1, lstate=ls,
                    env_cnt=env, sus=sus), out

    def gain_update(st):
        st_out = _loudness(window_energy(st["ring_out"], 30))
        return _update_gain(params, st, window_energy, st_out)

    def _out_meters(st):
        return dict(
            momentary=_loudness(window_energy(st["ring_out"], 4)),
            shortterm=_loudness(window_energy(st["ring_out"], 30)))

    @jax.jit
    def first_step(st, src):
        """process_first_frame (imp.rs:368-442)."""
        st = meas_in_30(st, src)
        shortterm = _loudness(window_energy(st["ring_in"], 30))
        above = shortterm >= -70.0
        env_short = jnp.where(above,
                              params.loudness_target - shortterm, 0.0)
        d0 = jnp.power(10.0, env_short / 20.0)
        delta = jnp.broadcast_to(d0[:, None], st["delta"].shape)
        prev_delta = delta[:, 1]                 # delta[index], index=1
        # delay line primed with the whole 3 s; limiter window gets the
        # first LIM samples scaled by prev_delta * offset
        dbuf = src
        lim = dbuf[:, :LIM * C] * (prev_delta
                                   * st["offset"])[:, None]
        st = dict(st, above=above, delta=delta, prev_delta=prev_delta,
                  dbuf=dbuf, lim=lim)
        gr1, lstate, sus = _limiter_first_special(
            params, st["lim"], st["gr1"], st["lstate"], st["sus"])
        st = dict(st, gr1=gr1, lstate=lstate, sus=sus)
        st, out = run_limiter(st, FRAME)
        st = meas_out(st, out)
        # dbuf stays the full 3 s: the linear-model invariant is
        # "read at offset LIM, shift by FRAME per inner fill", which
        # reproduces numpy's buf_index = LIM*C ring pointer exactly.
        if with_meter:
            # fused ebur128level must meter the priming frame too —
            # its message-interval counter covers every output block
            return st, out, _out_meters(st)
        return st, out

    @jax.jit
    def inner_step(st, src):
        """process_inner_frame (imp.rs:447-530 + 532-610)."""
        st = meas_in(st, src)
        st = fill_inner(st, src)
        st, out = run_limiter(st, FRAME)
        if with_meter:
            # fused ebur128level: the output chain is the meter
            st2 = meas_out(st, out)
            meters = _out_meters(st2)
        else:
            need_out = jnp.any(~st["above"])
            st2 = jax.lax.cond(need_out, lambda s: meas_out(s, out),
                               lambda s: s, st)
        st2 = gain_update(st2)
        if with_meter:
            return st2, out, meters
        return st2, out

    return first_step, inner_step
