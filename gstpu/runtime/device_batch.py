"""DeviceContext: the batched device execution path for elements.

The reference multiplexes hundreds of streams onto few OS threads via
named threadshare contexts (generic/threadshare/src/runtime/executor/
context.rs:148-276 Context::acquire, scheduler.rs throttled wakeups).
The TPU analogue (SURVEY §7 L2', §2.8 P2): elements that expose a
device kernel JOIN a named DeviceContext; the context is the batching
window — it re-blocks each member stream to the kernel block size,
and when every active member has a block it runs ONE jitted step over
the stacked (B, block) batch and distributes the outputs to every
member's src pad.  N streams -> one device dispatch, instead of N
per-buffer dispatches.

Overlap: with depth=2 the context submits batch k and only then
materializes batch k-1's outputs (JAX dispatch is async), so host
demux/distribution overlaps device compute — the double-buffered
H2D/D2H executor of SURVEY §7 L2'.  depth=1 distributes immediately.

Usage (element side): implement `device_batch_spec()` returning
  dict(key=<hashable kernel identity: members must match>,
       step=f(states, x (B, N), *uniform_arrays) -> (states, out),
       init_state=f() -> per-stream state pytree (no batch dim),
       uniforms=f() -> tuple of per-stream uniform scalars)
and call DeviceContext.acquire(name).add_member(element) in setup().
Elements with a `context` property (rsaudioecho) wire this up
automatically.  Per-stream outputs are bit-identical to the unbatched
path: kernels are batched elementwise and state rows are masked, so
batching never mixes streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gstpu.core.buffer import Buffer
from gstpu.utils.log import debug_category

CAT = debug_category("devicebatch")

SECOND = 1_000_000_000


@dataclass
class _Member:
    element: object
    spec: dict
    state: object            # per-stream device pytree (no batch dim)
    pending: bytearray = field(default_factory=bytearray)
    dtype: object = None
    pts: int | None = None
    rate: int = 0            # flattened samples per second (for pts)
    active: bool = True


class DeviceContext:
    """A named batching window shared by device elements."""

    _registry: dict[str, "DeviceContext"] = {}

    @classmethod
    def acquire(cls, name: str, block: int = 19_200,
                depth: int = 1) -> "DeviceContext":
        ctx = cls._registry.get(name)
        if ctx is None:
            ctx = cls._registry[name] = DeviceContext(name, block,
                                                      depth)
        return ctx

    @classmethod
    def release(cls, name: str) -> None:
        cls._registry.pop(name, None)

    def __init__(self, name: str, block: int, depth: int):
        self.name = name
        self.block = block            # flattened samples per fire
        self.depth = depth            # 1 = immediate, 2 = overlapped
        self.members: list[_Member] = []
        self.key = None
        self.fire_count = 0
        self._step = None
        self._pending_fire = None     # (device outs, members, metas)

    # -- membership -----------------------------------------------------
    def add_member(self, element) -> _Member:
        """Join at READY (reference: Context::acquire happens in the
        element's state change, before data flows).  The kernel spec
        needs negotiated caps, so it is finalized in finalize_member;
        a joined-but-unfinalized member holds the batch window open —
        membership is complete before the first fire."""
        m = self.member_for(element)
        if m is None:
            m = _Member(element=element, spec=None, state=None)
            self.members.append(m)
        return m

    def finalize_member(self, element) -> _Member:
        m = self.add_member(element)
        spec = element.device_batch_spec()
        if self.key is None:
            self.key = spec["key"]
        elif spec["key"] != self.key:
            raise ValueError(
                f"device-context {self.name!r}: kernel {spec['key']!r} "
                f"does not match the context's {self.key!r} (members "
                f"of one context must share static kernel parameters)")
        m.spec = spec
        m.state = spec["init_state"]()
        return m

    def member_for(self, element) -> _Member | None:
        for m in self.members:
            if m.element is element:
                return m
        return None

    def remove_member(self, element) -> None:
        m = self.member_for(element)
        if m is not None:
            self.members.remove(m)
        if not self.members:
            DeviceContext._registry.pop(self.name, None)

    # -- dataflow ---------------------------------------------------------
    def submit(self, element, samples: np.ndarray, pts, rate) -> None:
        """Append one stream's interleaved flat samples (host view)."""
        m = self.member_for(element)
        if m.pts is None and pts is not None:
            m.pts = pts - (len(m.pending) // samples.dtype.itemsize
                           * SECOND // max(rate, 1))
        m.dtype = samples.dtype
        m.rate = rate
        m.pending.extend(samples.tobytes())
        self.try_fire()

    def _ready(self, m: _Member) -> bool:
        if m.spec is None:
            return False
        item = np.dtype(m.dtype).itemsize if m.dtype else 8
        return len(m.pending) >= self.block * item

    def try_fire(self, force: bool = False) -> None:
        active = [m for m in self.members if m.active]
        if not active:
            return
        while True:
            ready = [m for m in active if self._ready(m)]
            if not ready or (not force and len(ready) != len(active)):
                break
            self._fire(ready)
            if force:
                break

    def _fire(self, ready: list[_Member]) -> None:
        import jax
        import jax.numpy as jnp

        spec = ready[0].spec
        rows, metas = [], []
        for m in ready:
            item = np.dtype(m.dtype).itemsize
            nbytes = self.block * item
            row = np.frombuffer(bytes(m.pending[:nbytes]),
                                dtype=m.dtype)
            del m.pending[:nbytes]
            pts = m.pts
            if pts is not None:
                m.pts = pts + self.block * SECOND // max(m.rate, 1)
            cdtype = spec.get("compute_dtype", np.float64)
            rows.append(row.astype(cdtype, copy=False))
            metas.append((m, pts))
        x = jnp.asarray(np.stack(rows))
        states = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[m.state for m in ready])
        uniforms = [jnp.asarray(np.asarray(u, np.float64)[:, None])
                    for u in zip(*[m.spec["uniforms"]() for m in ready])]
        states, out = spec["step"](states, x, *uniforms)
        for i, m in enumerate(ready):
            m.state = jax.tree_util.tree_map(lambda l: l[i], states)
        self.fire_count += 1
        CAT.log(f"context {self.name}: fired batch of {len(ready)} "
                f"x {self.block} (total {self.fire_count})")
        if self.depth <= 1:
            self._distribute(out, metas)
        else:
            prev, self._pending_fire = self._pending_fire, (out, metas)
            if prev is not None:
                self._distribute(*prev)

    def _distribute(self, out, metas) -> None:
        host = np.asarray(out)
        for i, (m, pts) in enumerate(metas):
            if not m.active:
                continue
            el = m.element
            dur = self.block * SECOND // max(m.rate, 1)
            buf = m.element.make_batch_buffer(
                host[i].astype(m.dtype, copy=False), pts, dur)
            el.srcpad.push(buf)

    # -- EOS / flush ------------------------------------------------------
    def flush_member(self, element) -> list[Buffer]:
        """Drain a member at EOS: flush any overlapped batch, then run
        the member's padded tail (other members' states are untouched
        because state rows are independent)."""
        m = self.member_for(element)
        if m is None:
            return []
        if m.spec is None:
            m.active = False
            self.try_fire()
            return []
        if self._pending_fire is not None:
            self._distribute(*self._pending_fire)
            self._pending_fire = None
        out = []
        item = np.dtype(m.dtype).itemsize if m.dtype else 8
        cdtype = m.spec.get("compute_dtype", np.float64)
        while m.dtype is not None and m.pending:
            import jax
            import jax.numpy as jnp
            avail = len(m.pending) // item
            n = min(avail, self.block)
            row = np.frombuffer(bytes(m.pending[:n * item]),
                                dtype=m.dtype)
            del m.pending[:n * item]
            x = jnp.asarray(np.pad(row.astype(cdtype, copy=False),
                                   (0, self.block - n))[None])
            state = jax.tree_util.tree_map(lambda l: l[None], m.state)
            uni = [jnp.asarray(np.asarray([u], np.float64)[:, None])
                   for u in m.spec["uniforms"]()]
            state, dev_out = m.spec["step"](state, x, *uni)
            m.state = jax.tree_util.tree_map(lambda l: l[0], state)
            host = np.asarray(dev_out)[0][:n]
            dur = n * SECOND // max(m.rate, 1)
            pts = m.pts
            if m.pts is not None:
                m.pts += dur
            out.append(m.element.make_batch_buffer(
                host.astype(m.dtype, copy=False), pts, dur))
        m.active = False
        # remaining members may all be ready now
        self.try_fire()
        return out


# ---------------------------------------------------------------------------
# checkpoint/resume (SURVEY §5.4: resumable stream state — a
# replacement process/chip restores member states and continues
# bit-exact; gstpu/parallel/checkpoint.py does the array IO)
# ---------------------------------------------------------------------------

def snapshot_context(ctx: DeviceContext, path: str) -> None:
    """Checkpoint every finalized member's carried kernel state plus
    its pending re-block bytes."""
    from gstpu.parallel.checkpoint import checkpoint
    states = [m.state for m in ctx.members if m.spec is not None]
    checkpoint(path, states, step=ctx.fire_count)
    # JSON + base64 sidecar (NOT pickle: a checkpoint from an
    # untrusted source must not execute code on restore)
    import base64
    import json
    recs = [{"pending": base64.b64encode(bytes(m.pending)).decode(),
             "pts": m.pts, "rate": m.rate,
             "dtype": np.dtype(m.dtype).str if m.dtype else None}
            for m in ctx.members if m.spec is not None]
    with open(path + ".pending", "w") as f:
        json.dump(recs, f)


def restore_context(ctx: DeviceContext, path: str) -> None:
    """Restore member states into an equally-shaped context (same
    members in the same order, finalized)."""
    import base64
    import json

    from gstpu.parallel.checkpoint import restore
    members = [m for m in ctx.members if m.spec is not None]
    like = [m.state for m in members]
    states, _step = restore(path, like)
    with open(path + ".pending") as f:
        pendings = json.load(f)
    if len(pendings) != len(members):
        raise ValueError("checkpoint member count mismatch")
    for m, st, rec in zip(members, states, pendings):
        m.state = st
        m.pending = bytearray(base64.b64decode(rec["pending"]))
        m.pts = rec["pts"]
        m.rate = rec["rate"]
        m.dtype = np.dtype(rec["dtype"]) if rec["dtype"] else None
