"""Batched multi-stream device processing with mesh sharding.

The core TPU-native runtime idea (SURVEY.md §7 L2'): many independent
media streams are stacked into a StreamBatch (B, N) and processed by
one jitted step; the batch axis shards over chips (data parallel over
*streams*, reference webrtcsink's 1-encoder-N-consumers fan-out
analogue), and within one very long stream the time axis can shard as
sequence blocks whose FIR/delay state crosses shard boundaries via
ICI collective-permute halos (ring-attention-shaped, but for DSP
carry — SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gstpu.ops import echo as echo_ops


def make_mesh(n_stream: int, n_seq: int = 1,
              devices=None) -> Mesh:
    """2D device mesh: stream (data-parallel) x seq (sequence-parallel)."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = n_stream * n_seq
    assert len(devices) >= n, (len(devices), n)
    arr = np.array(devices[:n]).reshape(n_stream, n_seq)
    return Mesh(arr, ("stream", "seq"))


# ---------------------------------------------------------------------------
# stream-sharded echo step (the flagship round-1 device pipeline)
# ---------------------------------------------------------------------------

def make_stream_sharded_echo(mesh: Mesh, delay: int):
    """Echo step over (B, N) blocks with B sharded across the 'stream'
    mesh axis. State (B, S) shards the same way; no cross-chip comms
    (streams are independent)."""

    spec = NamedSharding(mesh, P(("stream", "seq"), None))

    @partial(jax.jit, static_argnames=(), donate_argnums=(0,),
             out_shardings=(spec, spec))
    def step(tail, x, intensity, feedback):
        return echo_ops.echo_block(tail, x, intensity, feedback,
                                   delay=delay)

    return step, spec


# ---------------------------------------------------------------------------
# sequence-sharded FIR echo (feedback=0): halo exchange over ICI
# ---------------------------------------------------------------------------

def make_seq_sharded_fir_echo(mesh: Mesh, delay: int, seg_len: int):
    """Echo without feedback is a sparse FIR: out = x + i*delay(x).
    Shard a long block (B, n_seq*seg_len) over the 'seq' axis; each
    shard needs the last `delay` input samples of its left neighbor —
    fetched with lax.ppermute (ICI neighbor halo). Requires
    delay <= seg_len.
    """
    assert delay <= seg_len, (delay, seg_len)
    n_seq = mesh.shape["seq"]

    def shard_fn(tail, x, intensity):
        # x: (B_local, seg_len) — this shard's time segment
        # tail: (B_local, delay) — stream carry (end of *previous block*),
        #       only used by the first shard
        idx = jax.lax.axis_index("seq")
        halo_src = jnp.concatenate([tail, x], axis=-1)[..., -delay:]
        # pass each shard's trailing samples to its right neighbor
        left_halo = jax.lax.ppermute(
            halo_src, "seq",
            perm=[(i, (i + 1) % n_seq) for i in range(n_seq)])
        # shard 0 uses the stream carry; others use the neighbor halo
        prev = jnp.where(idx == 0, tail, left_halo)
        full = jnp.concatenate([prev, x], axis=-1)
        delayed = full[..., :seg_len]
        out = x + intensity * delayed
        # new stream carry comes from the LAST shard's tail; every
        # shard computes its own candidate, psum-masked to the last
        carry = jnp.where(idx == n_seq - 1, halo_src,
                          jnp.zeros_like(halo_src))
        carry = jax.lax.psum(carry, "seq")
        return carry, out

    from jax import shard_map

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(("stream",), None), P(("stream",), "seq"), P()),
        out_specs=(P(("stream",), None), P(("stream",), "seq")),
        check_vma=False)

    return jax.jit(mapped)


class StreamBatch:
    """Host-side handle for B device-resident stream states + a jitted
    chain step. The scheduler's batching window fills (B, N) blocks,
    this flushes them to the device in one dispatch."""

    def __init__(self, step, state):
        self.step = step
        self.state = state

    def process(self, blocks):
        """blocks: (B, N) ndarray -> (B, N) processed."""
        self.state, out = self.step(self.state, blocks)
        return out
