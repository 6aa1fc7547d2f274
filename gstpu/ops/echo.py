"""Echo/reverb kernel: delayed feedback over flattened interleaved
samples.

Reference semantics (audio/audiofx/src/audioecho/imp.rs:69-86 +
ring_buffer.rs): for each interleaved sample i (frames*channels
flattened, f64 math):

    e        = written[i - D]          # D = delay in flattened samples
    out[i]   = in[i] + intensity * e
    written[i] = in[i] + feedback * e

TPU-native formulation: instead of a ring buffer with a moving head,
the carried state is `tail` — the last S written samples in
chronological order. A block of N inputs is processed in segments of
length <= D: within a segment every delayed read lands in already-known
data (tail + previously processed segments), so each segment is pure
vector math — no gathers, no scan over samples. XLA fuses the whole
thing into a handful of elementwise ops; batched over a leading stream
axis for many-stream throughput (SURVEY.md §2.8 P7).

D and S are static (delay/max-delay are only mutable in READY,
imp.rs:96-133), so they are Python ints baked at trace time;
intensity/feedback are runtime uniforms (no recompile on change).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("delay",))
def echo_block(tail: jax.Array, x: jax.Array, intensity: jax.Array,
               feedback: jax.Array, *, delay: int):
    """Process one block.

    Args:
      tail: (..., S) last S *written* samples, oldest first. S >= delay.
      x: (..., N) input block (flattened interleaved samples).
      intensity, feedback: scalar uniforms (f64).
      delay: D, flattened-sample delay; static.
    Returns:
      (new_tail (..., S), out (..., N)) with out.dtype == x.dtype.
    """
    S = tail.shape[-1]
    N = x.shape[-1]
    D = delay
    assert S >= D >= 1, (S, D)
    xf = x.astype(jnp.float64)
    hist = tail
    outs = []
    off = 0
    while off < N:
        n = min(D, N - off)
        seg = xf[..., off:off + n]
        e = hist[..., hist.shape[-1] - D: hist.shape[-1] - D + n]
        # NOTE: XLA contracts mul+add into FMA (single rounding). This
        # is the only numerical deviation from the reference (rustc
        # emits strict mul-then-add): <=1 ulp per sample, and *more*
        # accurate. The exactness tests model it with a
        # correctly-rounded FMA golden (echo_reference(fma=True)).
        outs.append(seg + intensity * e)
        written = seg + feedback * e
        hist = jnp.concatenate([hist, written], axis=-1)
        # keep history bounded: only the last max(S, D) samples matter
        if hist.shape[-1] > S + D:
            hist = hist[..., -(S + D):]
        off += n
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    new_tail = hist[..., -S:]
    return new_tail, out.astype(x.dtype)


def make_state(shape_prefix: tuple[int, ...], max_delay_samples: int):
    """Fresh zeroed tail state (silence history)."""
    return jnp.zeros(shape_prefix + (max_delay_samples,), dtype=jnp.float64)


def echo_reference(x, delay: int, max_delay: int, intensity: float,
                   feedback: float, fma: bool = False):
    """Per-sample golden model mirroring the reference ring buffer
    exactly (audioecho imp.rs:69-86 + ring_buffer.rs).

    fma=False: strict IEEE mul-then-add, bit-identical to the Rust
    reference. fma=True: correctly-rounded fused multiply-add (exact
    rational arithmetic), bit-identical to the XLA kernel.
    """
    import numpy as np
    from fractions import Fraction

    if fma:
        fI, fF = Fraction(intensity), Fraction(feedback)

        def madd_out(inp, e):
            # float(Fraction) is correctly rounded -> true fma
            return float(Fraction(inp) + fI * Fraction(e))

        def madd_fb(inp, e):
            return float(Fraction(inp) + fF * Fraction(e))
    else:
        def madd_out(inp, e):
            return inp + intensity * e

        def madd_fb(inp, e):
            return inp + feedback * e

    ring = np.zeros(max_delay, dtype=np.float64)
    pos = 0
    size = ring.shape[0]
    d = min(delay, size)
    out = np.empty_like(x)
    read = (size - d + pos) % size
    flat = x.reshape(-1)
    outf = out.reshape(-1)
    for i in range(flat.shape[0]):
        e = float(ring[read])
        inp = float(flat[i])
        outf[i] = x.dtype.type(madd_out(inp, e))
        ring[pos] = madd_fb(inp, e)
        pos = (pos + 1) % size
        read = (read + 1) % size
    return out
