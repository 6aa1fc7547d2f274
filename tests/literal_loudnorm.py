"""Literal per-sample transcription of the reference audioloudnorm
limiter + frame logic (audio/audiofx/src/audioloudnorm/imp.rs), used
ONLY as a parity oracle for the vectorized implementation in
gstpu/elements/audio/loudnorm.py. Slow by design — plain Python loops
mirroring the Rust control flow statement by statement.
"""

import numpy as np

from gstpu.ops.ebur128 import EbuR128

GAIN_LOOKAHEAD = 3 * 192_000
FRAME_SIZE = 19_200
ATTACK = 1_920
RELEASE = 19_200
LOOKAHEAD = 1_920

OUT, ATT, SUS, REL = range(4)
FIRST, INNER, FINAL, LINEAR = range(4)


def gaussian_weights():
    sigma = 3.5
    x = np.arange(21) - 10.0
    w = (1 / (sigma * np.sqrt(2 * np.pi))) * np.exp(-x**2 / (2 * sigma**2))
    return w / w.sum()


class LiteralState:
    def __init__(self, channels, target_i=-24.0, target_lra=7.0,
                 max_tp=-2.0, offset_db=0.0):
        ch = channels
        self.ch = ch
        self.offset = 10 ** (offset_db / 20)
        self.target_i = target_i
        self.target_lra = target_lra
        self.target_tp = 10 ** (max_tp / 20)
        self.buf = np.zeros(GAIN_LOOKAHEAD * ch)
        self.buf_index = 0
        self.prev_buf_index = 0
        self.weights = gaussian_weights()
        self.delta = np.zeros(30)
        self.index = 1
        self.prev_delta = 0.0
        self.gr = [0.0, 0.0]
        self.limiter_buf = np.zeros((2 * FRAME_SIZE + LOOKAHEAD) * ch)
        self.limiter_buf_index = 0
        self.prev_smp = np.zeros(ch)
        self.state = OUT
        self.env_cnt = 0
        self.sustain_cnt = None
        self.frame_type = FIRST
        self.above_threshold = False
        modes = frozenset(("I", "S", "LRA", "sample_peak"))
        self.r128_in = EbuR128(ch, 192_000, modes)
        self.r128_out = EbuR128(ch, 192_000, modes)
        self.current_spf = GAIN_LOOKAHEAD

    def gaussian_filter(self, index):
        idx = index - 10 if index > 10 else index + 20
        result = 0.0
        d = list(self.delta[idx:]) + list(self.delta)
        for w, dd in zip(self.weights, d):
            result += dd * w
        return result

    def detect_peak(self, offset, samples):
        ch = self.ch
        L = self.limiter_buf.size
        index = (self.limiter_buf_index + (offset + LOOKAHEAD) * ch) % L
        for n in range(samples):
            next_index = (index + ch) % L
            this_v = self.limiter_buf[[(index + c) % L for c in range(ch)]]
            next_v = self.limiter_buf[[(next_index + c) % L
                                       for c in range(ch)]]
            detected = False
            for c in range(ch):
                this = abs(this_v[c])
                nxt = abs(next_v[c])
                detected = False
                if self.prev_smp[c] <= this and this >= nxt \
                        and this > self.target_tp and n > 0:
                    detected = True
                    for i in range(2, 12):
                        ni = (index + c + i * ch) % L
                        if abs(self.limiter_buf[ni]) > this:
                            detected = False
                            break
                    if detected:
                        break
                self.prev_smp[c] = this
            if detected:
                max_peak = 0.0
                for c in range(ch):
                    if c == 0 or abs(this_v[c]) > max_peak:
                        max_peak = abs(this_v[c])
                    self.prev_smp[c] = abs(this_v[c])
                return n, max_peak
            index = next_index
        return None

    def _mul(self, index, env):
        L = self.limiter_buf.size
        for c in range(self.ch):
            self.limiter_buf[(index + c) % L] *= env

    def limiter_out(self, smp_cnt, nb):
        peak = self.detect_peak(smp_cnt, nb - smp_cnt)
        if peak is not None:
            d, v = peak
            self.state = ATT
            self.env_cnt = 0
            self.sustain_cnt = None
            self.gr[0] = 1.0
            self.gr[1] = self.target_tp / v
            smp_cnt += LOOKAHEAD + d - ATTACK
        else:
            smp_cnt = nb
        return smp_cnt

    def limiter_attack(self, smp_cnt, nb):
        ch = self.ch
        L = self.limiter_buf.size
        peak = self.detect_peak(smp_cnt, nb - smp_cnt)
        new_peak_smp = smp_cnt + peak[0] if peak is not None else None
        index = (self.limiter_buf_index + smp_cnt * ch) % L
        while self.env_cnt < ATTACK and smp_cnt < nb:
            if new_peak_smp is not None and smp_cnt == new_peak_smp:
                break
            env = self.gr[0] - (self.env_cnt / (ATTACK - 1.0)
                                * (self.gr[0] - self.gr[1]))
            self._mul(index, env)
            index = (index + ch) % L
            smp_cnt += 1
            self.env_cnt += 1
        if new_peak_smp is not None:
            assert smp_cnt < nb
            if smp_cnt < new_peak_smp:
                for _ in range(smp_cnt, new_peak_smp):
                    self._mul(index, self.gr[1])
                    index = (index + ch) % L
                smp_cnt = new_peak_smp
            assert smp_cnt < nb
            v = peak[1]
            gain_reduction = self.target_tp / v
            if gain_reduction < self.gr[1]:
                current = self.gr[0] - (self.env_cnt / (ATTACK - 1.0)
                                        * (self.gr[0] - self.gr[1]))
                old_slope = -(self.gr[0] - self.gr[1])
                new_slope = -(current - gain_reduction)
                if new_slope <= old_slope:
                    self.state = ATT
                    self.gr[0] = current
                    self.gr[1] = gain_reduction
                    self.env_cnt = 0
                    self.sustain_cnt = None
                else:
                    new_end = max((gain_reduction - self.gr[0]) / old_slope,
                                  1.0)
                    new_start = new_end - 1.0
                    self.gr[0] = self.gr[0] + new_start * old_slope
                    self.gr[1] = gain_reduction
                    cur_pos = (current - self.gr[0]) / old_slope
                    cur_pos = min(max(cur_pos, 0.0), 1.0)
                    self.env_cnt = int((ATTACK - 1.0) * cur_pos)
                    self.sustain_cnt = self.env_cnt
                return smp_cnt
            else:
                if self.env_cnt < ATTACK:
                    self.sustain_cnt = self.env_cnt
        if self.env_cnt == ATTACK and smp_cnt < nb:
            self.state = SUS
        return smp_cnt

    def limiter_sustain(self, smp_cnt, nb):
        ch = self.ch
        L = self.limiter_buf.size
        peak = self.detect_peak(smp_cnt, nb - smp_cnt)
        sustain_cnt = peak[0] if peak is not None else self.sustain_cnt
        if sustain_cnt is not None:
            index = (self.limiter_buf_index + smp_cnt * ch) % L
            s = 0
            while s < sustain_cnt and smp_cnt < nb:
                self._mul(index, self.gr[1])
                index = (index + ch) % L
                smp_cnt += 1
                s += 1
            if peak is not None:
                v = peak[1]
                gain_reduction = self.target_tp / v
                if gain_reduction < self.gr[1]:
                    self.state = ATT
                    self.env_cnt = 0
                    self.sustain_cnt = None
                    self.gr[0] = self.gr[1]
                    self.gr[1] = gain_reduction
                else:
                    self.sustain_cnt = LOOKAHEAD
            elif self.sustain_cnt is not None:
                self.sustain_cnt -= s
                if self.sustain_cnt == 0:
                    self.sustain_cnt = None
            else:
                raise AssertionError("unreachable")
        else:
            self.state = REL
            self.gr[0] = self.gr[1]
            self.gr[1] = 1.0
            self.env_cnt = 0
        return smp_cnt

    def limiter_release(self, smp_cnt, nb):
        ch = self.ch
        L = self.limiter_buf.size
        index = (self.limiter_buf_index + smp_cnt * ch) % L
        peak = self.detect_peak(smp_cnt, nb - smp_cnt)
        if peak is not None:
            d, v = peak
            gain_reduction = self.target_tp / v
            current = self.gr[0] - (self.env_cnt / (RELEASE - 1.0)
                                    * (self.gr[1] - self.gr[0]))
            if gain_reduction < current:
                assert smp_cnt + d < nb
                for _ in range(d):
                    self._mul(index, self.gr[1])
                    index = (index + ch) % L
                    smp_cnt += 1
                    assert smp_cnt < nb
                self.state = ATT
                self.env_cnt = 0
                self.sustain_cnt = None
                self.gr[0] = current
                self.gr[1] = gain_reduction
            else:
                self.gr[1] = current
                self.state = SUS
            return smp_cnt
        while self.env_cnt < RELEASE and smp_cnt < nb:
            env = self.gr[0] - (self.env_cnt / (RELEASE - 1.0)
                                * (self.gr[1] - self.gr[0]))
            self._mul(index, env)
            index = (index + ch) % L
            smp_cnt += 1
            self.env_cnt += 1
        if smp_cnt < nb:
            self.state = OUT
        return smp_cnt

    def limiter_first_frame(self):
        ch = self.ch
        assert self.limiter_buf_index == 0
        max_ = 0.0
        for s in self.limiter_buf[:(LOOKAHEAD + 1) * ch]:
            if abs(s) > max_:
                max_ = s
        for c in range(ch):
            self.prev_smp[c] = abs(self.limiter_buf[LOOKAHEAD * ch + c])
        if max_ > self.target_tp:
            self.state = SUS
            self.sustain_cnt = LOOKAHEAD
            self.gr[1] = self.target_tp / max_

    def true_peak_limiter(self, nb):
        ch = self.ch
        L = self.limiter_buf.size
        if self.frame_type == FIRST:
            self.limiter_first_frame()
        smp_cnt = 0
        while smp_cnt < nb:
            if self.state == OUT:
                smp_cnt = self.limiter_out(smp_cnt, nb)
            elif self.state == ATT:
                smp_cnt = self.limiter_attack(smp_cnt, nb)
            elif self.state == SUS:
                smp_cnt = self.limiter_sustain(smp_cnt, nb)
            else:
                smp_cnt = self.limiter_release(smp_cnt, nb)
        out = np.empty(nb * ch)
        index = self.limiter_buf_index
        for n in range(nb):
            for c in range(ch):
                o = self.limiter_buf[(index + c) % L]
                if abs(o) > self.target_tp:
                    o = self.target_tp * np.sign(o)
                out[n * ch + c] = o
            index = (index + ch) % L
        return out

    # frame machinery -------------------------------------------------
    def fill_inner(self, src):
        ch = self.ch
        gain = self.gaussian_filter((self.index + 10) % 30)
        gain_next = self.gaussian_filter((self.index + 11) % 30)
        n = src.size // ch
        Lb, Ll = self.buf.size, self.limiter_buf.size
        for k in range(n):
            cur = (gain + (k / FRAME_SIZE) * (gain_next - gain)) \
                * self.offset
            for c in range(ch):
                self.limiter_buf[(self.limiter_buf_index + c) % Ll] = \
                    self.buf[(self.buf_index + c) % Lb] * cur
                self.buf[(self.prev_buf_index + c) % Lb] = src[k * ch + c]
            self.limiter_buf_index = (self.limiter_buf_index + ch) % Ll
            self.prev_buf_index = (self.prev_buf_index + ch) % Lb
            self.buf_index = (self.buf_index + ch) % Lb

    def fill_final(self, idx, num_samples):
        ch = self.ch
        gain = self.gaussian_filter((self.index + 10) % 30)
        gain_next = self.gaussian_filter((self.index + 11) % 30)
        Lb, Ll = self.buf.size, self.limiter_buf.size
        for k in range(idx, num_samples):
            cur = (gain + (k / num_samples) * (gain_next - gain)) \
                * self.offset
            for c in range(ch):
                self.limiter_buf[(self.limiter_buf_index + c) % Ll] = \
                    self.buf[(self.buf_index + c) % Lb] * cur
            self.limiter_buf_index = (self.limiter_buf_index + ch) % Ll
            self.buf_index = (self.buf_index + ch) % Lb

    def update_gain(self):
        g = self.r128_in.loudness_global()
        st = self.r128_in.loudness_shortterm()
        rt = self.r128_in.relative_threshold()
        if not self.above_threshold:
            if st > -70.0:
                self.prev_delta *= 1.0058
            st_out = self.r128_out.loudness_shortterm()
            if st_out >= self.target_i:
                self.above_threshold = True
        if st < rt or st <= -70.0 or not self.above_threshold:
            self.delta[self.index] = self.prev_delta
        else:
            if abs(st - g) < self.target_lra / 2.0:
                env_global = st - g
            elif (self.target_lra / 2.0) * (st - g) < 0.0:
                env_global = -1.0
            else:
                env_global = 1.0
            self.delta[self.index] = 10 ** ((env_global
                                             + (self.target_i - st)) / 20)
        self.prev_delta = self.delta[self.index]
        self.index = (self.index + 1) % 30

    def process(self, src):
        ch = self.ch
        self.r128_in.add_frames(src.reshape(-1, ch))
        if self.frame_type == FIRST and src.size // ch < self.current_spf:
            g = self.r128_in.loudness_global()
            tp = max((self.r128_in.sample_peak(c) for c in range(ch)),
                     default=0.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                off = np.float64(10.0) ** ((self.target_i - g) / 20)
                otp = np.float64(tp) * off
                self.offset = float(off) if otp < self.target_tp \
                    else float(np.float64(self.target_tp) / np.float64(tp))
            self.frame_type = LINEAR

        if self.frame_type == FIRST:
            self.buf[:] = src
            st = self.r128_in.loudness_shortterm()
            if st < -70.0:
                self.above_threshold = False
                env = 0.0
            else:
                self.above_threshold = True
                env = self.target_i - st
            self.delta[:] = 10 ** (env / 20)
            self.prev_delta = self.delta[self.index]
            self.limiter_buf[:] = self.buf[:self.limiter_buf.size] \
                * self.prev_delta * self.offset
            self.buf_index = self.limiter_buf.size
            self.limiter_buf_index = 0
            out = self.true_peak_limiter(FRAME_SIZE)
            self.r128_out.add_frames(out.reshape(-1, ch))
            self.current_spf = FRAME_SIZE
            self.frame_type = INNER
            return out
        if self.frame_type == INNER:
            self.fill_inner(src)
            out = self.true_peak_limiter(FRAME_SIZE)
            self.r128_out.add_frames(out.reshape(-1, ch))
            self.update_gain()
            return out
        if self.frame_type == FINAL:
            num_samples = src.size // ch
            self.fill_inner(src)
            if num_samples != FRAME_SIZE:
                self.fill_final(num_samples, FRAME_SIZE)
            out_num = 30 * FRAME_SIZE - (FRAME_SIZE - num_samples)
            out = np.empty(out_num * ch)
            smp_cnt = 0
            while smp_cnt < out_num:
                fs = min(out_num - smp_cnt, FRAME_SIZE)
                dst = self.true_peak_limiter(fs)
                out[smp_cnt * ch:(smp_cnt + fs) * ch] = dst
                smp_cnt += fs
                if smp_cnt == out_num:
                    break
                self.r128_out.add_frames(dst.reshape(-1, ch))
                self.update_gain()
                nfs = min(out_num - smp_cnt, FRAME_SIZE)
                self.fill_final(0, nfs)
                if nfs < FRAME_SIZE:
                    self.limiter_buf_index = (
                        self.limiter_buf_index
                        + (FRAME_SIZE - nfs) * ch) % self.limiter_buf.size
            return out
        # LINEAR
        out = src * self.offset
        self.r128_out.add_frames(out.reshape(-1, ch))
        return out
