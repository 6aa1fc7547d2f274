"""DeviceContext: the batched device execution path for elements.

The reference multiplexes hundreds of streams onto few OS threads via
named threadshare contexts (generic/threadshare/src/runtime/executor/
context.rs:148-276 Context::acquire, scheduler.rs throttled wakeups).
The TPU analogue (SURVEY §7 L2', §2.8 P2): elements that expose a
device kernel JOIN a named DeviceContext; the context is the batching
window — it re-blocks each member stream to the kernel block size,
and when every active member has a block it runs ONE jitted step over
the stacked (B, block) batch and distributes the outputs.
N streams -> one device dispatch, instead of N per-buffer dispatches.

CHAIN FUSION (the L2' "a chain of elements becomes one jitted
function" — as the execution path, not just ops/parallel/chains.py):
when members of one context are LINKED through pads (e.g. every
pipeline runs `rsaudioecho ! audioloudnorm ! ebur128level`, all three
naming the same context), the context discovers the chains from pad
topology and compiles the stage kernels into ONE fused jitted step.
Data enters at each chain's head element and leaves from its tail
element's src pad; the intermediate pads carry only events.  One
dispatch per block round covers every stage of every stream.

Device-resident dataflow: a member may submit jax arrays (or
DeviceRow views of a shared (B, n) bank) instead of host samples; the
batch is then assembled on device and outputs are distributed as lazy
DeviceRow buffers — no host<->device transfer in the steady state
(how the real chip is fed in production; the dev tunnel's ~45 MB/s
would otherwise be the measurement).

Overlap: with depth=2 the context submits batch k and only then
materializes batch k-1's outputs (JAX dispatch is async), so host
demux/distribution overlaps device compute — the double-buffered
H2D/D2H executor of SURVEY §7 L2'.  depth=1 distributes immediately.

Usage (element side): implement `device_batch_spec()` returning
  dict(key=<hashable kernel identity: stage members must match>,
       step=f(states, x (B, N), *uniform_arrays) -> (states, out)
            or -> (states, out, aux)   # aux: metering pytree, (B,...)
       init_state=f() -> per-stream state pytree (no batch dim),
       uniforms=f() -> tuple of per-stream uniform scalars,
       # optional:
       prime=f(states, x (B, prime_blocks*N)) -> like step
            — a first-fire priming phase (audioloudnorm's 3 s
              lookahead frame); output is ONE block
       prime_blocks=int,
       wide_ok=True   # step accepts arbitrary-width x (an element
                      # upstream of a priming stage needs this)
       )
and call DeviceContext.acquire(name).add_member(element) in start().
Elements with a `context` property (rsaudioecho, audioloudnorm,
ebur128level, audiornnoise, hsvfilter, colorlut, ...) wire this up
automatically.  Per-stream outputs are bit-identical to the unbatched
B=1 path on the same backend: kernels are batched elementwise and
state rows are independent, so batching never mixes streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gstpu.core.buffer import Buffer
from gstpu.utils.log import debug_category

CAT = debug_category("devicebatch")

SECOND = 1_000_000_000


class DeviceRow:
    """Lazy view of row `idx` of a device-resident (B, ...) batch.

    Used both for zero-RPC submission (rows of a pre-uploaded bank)
    and for lazy output distribution (slicing every row eagerly would
    issue B device ops per fire over the tunnel).

    The parent may be flat (B, n) or shaped (B, H, W, C) — video
    specs carry batches in their NATIVE rank because flattening a
    tiled u8 frame batch costs a device relayout (~12 ms/frame at
    4K, measured).  `n`/`shape` always present the flat sample count
    so stream accounting stays rank-agnostic; `jax()` returns the
    row in the parent's own rank."""

    __slots__ = ("parent", "idx", "n")

    def __init__(self, parent, idx: int, n: int | None = None):
        self.parent = parent
        self.idx = idx
        if n is None:
            n = 1
            for d in parent.shape[1:]:      # math over ints: this is
                n *= d                      # per-stream-per-fire hot
        self.n = int(n)

    @property
    def shape(self):
        return (self.n,)

    @property
    def dtype(self):
        return self.parent.dtype

    @property
    def nbytes(self) -> int:
        return self.n * np.dtype(self.parent.dtype).itemsize

    def jax(self):
        row = self.parent[self.idx]
        if row.ndim > 1:
            return row                  # native-rank video row
        return row[: self.n] if self.n != self.parent.shape[1] else row

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self.jax())
        return a.astype(dtype) if dtype is not None else a


class AuxView:
    """Per-fire metering pytree shared by every lane's element:
    materializes ALL (B, ...) leaves ONCE on first access, in a
    single concurrent device_get (N elements reading the leaves must
    not issue N transfers, and sequential per-leaf np.asarray pays
    one full device round-trip EACH — over a high-latency link the
    difference between one RTT and len(leaves) RTTs per metering
    interval)."""

    def __init__(self, leaves: dict):
        self._leaves = leaves
        self._host: dict | None = None
        # start the D2H copies NOW (bytes are tiny — (B,) meter rows);
        # by the time a metering-interval boundary reads them the
        # transfer has ridden along behind the compute instead of
        # paying a fresh round-trip that drains the fire pipeline
        for v in leaves.values():
            fn = getattr(v, "copy_to_host_async", None)
            if fn is not None:
                try:
                    fn()
                except Exception:
                    pass            # backend without async copies

    def __getitem__(self, k):
        if self._host is None:
            import jax
            self._host = jax.device_get(self._leaves)
        return self._host[k]

    def keys(self):
        return self._leaves.keys()


def _is_device(x) -> bool:
    """jax.Array or DeviceRow (duck-typed; avoids importing jax at
    module load)."""
    return isinstance(x, DeviceRow) or type(x).__module__.startswith(
        ("jax", "jaxlib"))


@dataclass
class _Member:
    element: object
    spec: dict | None
    state: object            # per-stream device pytree (no batch dim)
    pending: bytearray = field(default_factory=bytearray)
    dev_rows: list = field(default_factory=list)   # device submissions
    dev_avail: int = 0       # flattened samples queued in dev_rows
    dtype: object = None
    pts: int | None = None
    rate: int = 0            # flattened samples per second (for pts)
    active: bool = True
    primed: bool = False     # chain-head flag: priming fire done
    out_pts: int | None = None   # chain-head output pts cursor
    chain: object = None     # backref set by _build_chains
    ready: bool = False      # head flag: avail >= need (incremental
                             # mirror; authoritative scan in try_fire)


@dataclass
class _Stage:
    """One kernel stage of a composed chain.  Usually 1:1 with a
    member; a spec that declares `fuse_next` can fold its downstream
    neighbour(s) into ONE stage (e.g. audioloudnorm absorbs a
    compatible ebur128level: the output-measurement pass the gain
    machine already runs IS the meter — reference
    audio/audiofx/src/ebur128level/imp.rs runs a second full
    K-weighting chain instead; on device one pass feeds both).  The
    fused spec must preserve `owner`'s state pytree structure
    (checkpoint/resume stays layout-compatible either way)."""
    spec: dict
    owner: object            # _Member whose .state carries this stage
    members: list            # every _Member folded into this stage


@dataclass
class _Chain:
    members: list            # [_Member] head..tail
    stages: list = None      # [_Stage] set by _build_chains

    @property
    def head(self):
        return self.members[0]

    @property
    def tail(self):
        return self.members[-1]

    # chain-level state lives on the head member so that topology
    # rebuilds (late joiners) never lose it
    @property
    def primed(self):
        return self.head.primed

    @primed.setter
    def primed(self, v):
        self.head.primed = v

    @property
    def out_pts(self):
        return self.head.out_pts

    @out_pts.setter
    def out_pts(self, v):
        self.head.out_pts = v


class DeviceContext:
    """A named batching window shared by device elements."""

    _registry: dict[str, "DeviceContext"] = {}

    @classmethod
    def acquire(cls, name: str, block: int | None = None,
                depth: int = 1) -> "DeviceContext":
        ctx = cls._registry.get(name)
        if ctx is None:
            # block 0 = "sized from negotiated caps" (video elements
            # set it at finalize); None = default audio block
            ctx = cls._registry[name] = DeviceContext(
                name, 19_200 if block is None else block, depth)
        elif block and ctx.block != block:
            raise ValueError(
                f"device-context {name!r} exists with block "
                f"{ctx.block}, requested {block} (set the same "
                f"context-block on every member)")
        return ctx

    @classmethod
    def release(cls, name: str) -> None:
        cls._registry.pop(name, None)

    def __init__(self, name: str, block: int, depth: int):
        self.name = name
        self.block = block            # flattened samples per fire
        self.depth = depth            # 1 = immediate, 2 = overlapped
        self.members: list[_Member] = []
        self.chains: list[_Chain] | None = None
        self.key = None               # tuple of stage keys
        self.fire_count = 0
        self._has_unfinalized = False
        self._prime_n = 1
        # incremental readiness mirror: submit() bumps these instead
        # of rescanning every chain (the scan was ~70% of per-round
        # host time at B=64); try_fire's full scan stays the
        # authority and recounts them exactly
        self._n_ready = 0
        self._n_active = 0
        self._fused = None            # (step_fn, prime_fn, n_stages)
        self._pending_fire = None     # (outs, chains, metas, device)
        # steady-state caches: carried states stay BATCHED on device
        # between fires (scattering per-member after every fire would
        # issue chains*leaves tiny device ops — fatal over a
        # high-latency tunnel); split back only on demand
        self._batched = None          # (chain_id_tuple, states tuple)
        self._uni_cache = None        # (values_key, device arrays)

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
            self.chains = None        # topology changed
        return m

    def finalize_member(self, element) -> _Member:
        m = self.add_member(element)
        m.spec = element.device_batch_spec()
        m.state = m.spec["init_state"]()
        self.chains = None
        return m

    def member_for(self, element) -> _Member | None:
        for m in self.members:
            if m.element is element:
                return m
        return None

    def remove_member(self, element) -> None:
        self._writeback()
        m = self.member_for(element)
        if m is not None:
            self.members.remove(m)
            self.chains = None
        if not self.members:
            DeviceContext._registry.pop(self.name, None)

    # -- chain discovery --------------------------------------------------
    def _build_chains(self) -> bool:
        """Group FINALIZED members into pad-linked chains.  Unfinalized
        members hold the batch window open (try_fire waits) but do not
        block chain construction — an EOS drain of a finalized chain
        must proceed regardless.  Returns False if nothing usable."""
        fin = [m for m in self.members if m.spec is not None]
        self._has_unfinalized = len(fin) != len(self.members)
        if not fin:
            return False
        by_el = {id(m.element): m for m in fin}

        def downstream(m):
            src = getattr(m.element, "srcpad", None)
            peer = getattr(src, "peer", None)
            el = getattr(peer, "element", None)
            return by_el.get(id(el)) if el is not None else None

        downs = {id(m): downstream(m) for m in fin}
        tails = {id(d) for d in downs.values() if d is not None}
        heads = [m for m in fin if id(m) not in tails]
        chains = []
        seen = set()
        for h in heads:
            links, m = [], h
            while m is not None and id(m) not in seen:
                seen.add(id(m))
                links.append(m)
                m = downs[id(m)]
            chains.append(_Chain(members=links))
        if len(seen) != len(fin):
            raise ValueError(
                f"device-context {self.name!r}: members form a cycle")
        for c in chains:
            for m in c.members:
                m.chain = c
            c.stages = self._fuse_stages(c.members)
        key = tuple(tuple(s.spec["key"] for s in c.stages)
                    for c in chains)
        if len(set(key)) != 1:
            raise ValueError(
                f"device-context {self.name!r}: chains differ: "
                f"{sorted(set(key))} (all chains of one context must "
                f"run the same kernel sequence)")
        self.key = key[0]
        self.chains = chains
        self._fused = self._compose([s.spec for s in chains[0].stages])
        self._prime_n = max((s.spec.get("prime_blocks", 1)
                             for s in chains[0].stages), default=1)
        return True

    @staticmethod
    def _fuse_stages(members: list) -> list:
        """Peephole pass over a chain's member specs: a spec with
        `fuse_next(next_spec) -> fused_spec | None` absorbs its
        downstream neighbour into one stage (repeatable — a fused
        spec may itself declare fuse_next).  Disable with
        GSTPU_NO_CHAIN_FUSION=1 (A/B identity tests)."""
        import os
        if os.environ.get("GSTPU_NO_CHAIN_FUSION"):
            return [_Stage(spec=m.spec, owner=m, members=[m])
                    for m in members]
        stages = []
        i = 0
        while i < len(members):
            m = members[i]
            spec = m.spec
            folded = [m]
            while i + 1 < len(members):
                fuse = spec.get("fuse_next")
                if fuse is None:
                    break
                fspec = fuse(members[i + 1].spec)
                if fspec is None:
                    break
                spec = fspec
                folded.append(members[i + 1])
                i += 1
            stages.append(_Stage(spec=spec, owner=m, members=folded))
            i += 1
        return stages

    def _compose(self, specs: list[dict]):
        """Fuse the stage kernels of one chain shape into single
        jitted step/prime functions over (B, n) batches."""
        import jax

        prime_idx = [j for j, s in enumerate(specs)
                     if s.get("prime") is not None]
        if len(prime_idx) > 1:
            raise ValueError("at most one priming stage per chain")
        pj = prime_idx[0] if prime_idx else None
        final_idx = [j for j, s in enumerate(specs)
                     if s.get("final") is not None]
        fj = final_idx[0] if final_idx else None
        if pj is not None:
            for j in range(pj):
                if not specs[j].get("wide_ok"):
                    raise ValueError(
                        f"stage {specs[j]['key']!r} is upstream of a "
                        f"priming stage but not wide_ok")
        n_stages = len(specs)

        def run(states, x, unis, priming):
            aux = [None] * n_stages
            new_states = []
            for j, spec in enumerate(specs):
                fn = spec["prime"] if (priming and j == pj) \
                    else spec["step"]
                res = fn(states[j], x, *unis[j])
                if len(res) == 3:
                    st, x, aux[j] = res
                else:
                    st, x = res
                new_states.append(st)
            return tuple(new_states), x, aux

        step = jax.jit(lambda states, x, unis: run(states, x, unis,
                                                   False))
        prime = jax.jit(lambda states, x, unis: run(states, x, unis,
                                                    True)) \
            if pj is not None else step

        final = None
        if fj is not None:
            import jax.numpy as jnp

            def run_final(states, x, n_valid, unis):
                new_states = []
                out_valid = None
                for j, spec in enumerate(specs):
                    if j == fj:
                        # the padding beyond n_valid must enter the
                        # draining stage as SILENCE (the host element
                        # receives exactly n samples)
                        mask = (jnp.arange(x.shape[1]) < n_valid)
                        x = x * mask[None, :].astype(x.dtype)
                        st, x, out_valid = spec["final"](
                            states[j], x, n_valid)
                    else:
                        res = spec["step"](states[j], x, *unis[j])
                        st, x = res[0], res[1]
                    new_states.append(st)
                return tuple(new_states), x, out_valid

            final = jax.jit(run_final)
        return step, prime, n_stages, final

    def _prime_blocks(self) -> int:
        return self._prime_n

    # -- dataflow ---------------------------------------------------------
    def submit(self, element, samples, pts, rate) -> None:
        """Append one stream's flat samples — a host ndarray, a jax
        array, or a DeviceRow of a shared bank — at the chain's head
        element."""
        m = self.member_for(element)
        if _is_device(samples):
            n = 1
            for d in samples.shape:     # ints, not np.prod: hot path
                n *= d
            if m.pts is None and pts is not None:
                m.pts = pts - m.dev_avail * SECOND // max(rate, 1)
            m.dtype = np.dtype(samples.dtype)
            m.rate = rate
            m.dev_rows.append(samples)
            m.dev_avail += n
        else:
            if m.pts is None and pts is not None:
                m.pts = pts - (len(m.pending) // samples.dtype.itemsize
                               * SECOND // max(rate, 1))
            m.dtype = samples.dtype
            m.rate = rate
            m.pending.extend(samples.tobytes())
        # incremental gate: a fire needs EVERY active chain ready, so
        # only this member's own readiness can have changed here —
        # update the counter and skip the full B-chain scan until the
        # set completes (the scan was ~70% of per-round host time at
        # B=64, measured).  try_fire recounts exactly whenever it
        # does scan, so the mirror can never wedge the context.
        c = m.chain
        if (c is not None and self.chains is not None
                and not self._has_unfinalized and m.active):
            now = self._avail(m) >= self._need(c)
            if now != m.ready:
                m.ready = now
                self._n_ready += 1 if now else -1
            if self._n_ready < self._n_active:
                return
        self.try_fire()

    def _avail(self, m: _Member) -> int:
        if m.dev_rows:
            return m.dev_avail
        item = np.dtype(m.dtype).itemsize if m.dtype else 8
        return len(m.pending) // item

    def _need(self, c: _Chain) -> int:
        return self.block * (1 if c.primed else self._prime_blocks())

    def try_fire(self, force: bool = False) -> None:
        if self.chains is None and not self._build_chains():
            return
        if self._has_unfinalized and not force:
            return                    # membership still incomplete
        active = [c for c in self.chains if c.head.active]
        self._n_active = len(active)
        if not active:
            self._n_ready = 0
            return
        while True:
            ready = []
            for c in active:
                r = self._avail(c.head) >= self._need(c)
                c.head.ready = r
                if r:
                    ready.append(c)
            self._n_ready = len(ready)
            # chains must fire in phase lockstep: a mixed
            # primed/unprimed set fires the unprimed group first
            if ready:
                unprimed = [c for c in ready if not c.primed]
                ready = unprimed or ready
                want = ([c for c in active if not c.primed]
                        if unprimed else active)
            else:
                want = active
            if not ready or (not force and len(ready) != len(want)):
                break
            self._fire(ready)
            if force:
                break

    def _take_input(self, m: _Member, n: int):
        """Pop n flattened samples from a member; returns
        (host_row | device_obj, device?)."""
        if m.dev_rows:
            if m.dev_rows and isinstance(m.dev_rows[0], DeviceRow) \
                    and m.dev_rows[0].n == n:
                row = m.dev_rows.pop(0)
                m.dev_avail -= n
                return row, True
            import jax.numpy as jnp
            rows, have = [], 0
            while have < n and m.dev_rows:
                r = m.dev_rows.pop(0)
                rj = r.jax() if isinstance(r, DeviceRow) else r
                if rj.ndim > 1:         # native-rank video row: the
                    rj = rj.reshape(-1)  # re-blocking path is flat
                rows.append(rj)
                have += int(rj.shape[-1])
            m.dev_avail -= n
            cat = rows[0] if len(rows) == 1 else jnp.concatenate(rows)
            if have > n:                      # push back the excess
                m.dev_rows.insert(0, cat[n:])
                cat = cat[:n]
            return cat, True
        item = np.dtype(m.dtype).itemsize
        row = np.frombuffer(bytes(m.pending[:n * item]), dtype=m.dtype)
        del m.pending[:n * item]
        return row, False

    def _stack_states(self, chains, stage_j):
        import jax
        return jax.tree_util.tree_map(
            lambda *leaves: jax.numpy.stack(leaves),
            *[c.stages[stage_j].owner.state for c in chains])

    def _writeback(self) -> None:
        """Scatter the cached batched states back onto their member
        pytrees (before membership changes, flush, or checkpoint).
        Eager per-chain-per-leaf slicing is deliberate: the slices
        dispatch asynchronously and their kernels cache after first
        use, while a jitted all-rows splitter (tried round 5) has
        chains*leaves OUTPUTS and compiles for minutes at B=64 —
        far worse than the one-time eager-kernel warmup it saves."""
        if self._batched is None:
            return
        import jax
        ids, states = self._batched
        self._batched = None
        by_id = {id(c): c for c in (self.chains or [])}
        chains = [by_id.get(i) for i in ids]
        for j in range(len(states)):
            for i, c in enumerate(chains):
                if c is not None:
                    c.stages[j].owner.state = jax.tree_util.tree_map(
                        lambda leaf: leaf[i], states[j])

    def _fire(self, ready: list[_Chain]) -> None:
        import jax
        import jax.numpy as jnp

        priming = not ready[0].primed
        n = self.block * (self._prime_blocks() if priming else 1)
        step, prime, n_stages, _final = self._fused
        specs = [s.spec for s in ready[0].stages]

        rows, metas, dev_in = [], [], False
        for c in ready:
            h = c.head
            row, is_dev = self._take_input(h, n)
            dev_in = dev_in or is_dev
            pts = h.pts
            if pts is not None:
                h.pts = pts + n * SECOND // max(h.rate, 1)
            if c.out_pts is None:
                c.out_pts = pts
            rows.append(row)
            metas.append((c, pts))

        # video specs declare their native sample rank: the batch is
        # carried as (B, *sample_shape) end-to-end because flattening
        # a tiled u8 frame batch costs a device relayout (~12
        # ms/frame at 4K, measured — the difference between 19 and
        # 65 fps on the 4K chain)
        sshape = tuple(specs[0].get("sample_shape") or ())

        # fast path: every row is DeviceRow i of the same (B, n) bank
        if dev_in and all(isinstance(r, DeviceRow) for r in rows) \
                and len({id(r.parent) for r in rows}) == 1 \
                and [r.idx for r in rows] == list(range(len(rows))) \
                and rows[0].parent.shape[0] == len(rows):
            x = rows[0].parent
        elif dev_in:
            def rowj(r):
                rj = r.jax() if isinstance(r, DeviceRow) else r
                if sshape and rj.ndim == 1:
                    rj = rj.reshape(sshape)
                elif not sshape and rj.ndim > 1:
                    rj = rj.reshape(-1)
                return rj
            x = jnp.stack([rowj(r) for r in rows])
        else:
            cdtype = specs[0].get("compute_dtype", np.float64)
            host = np.stack([r.astype(cdtype, copy=False)
                             for r in rows])
            if sshape and host.ndim == 2:
                # reshape host-side: the upload then lands in the
                # native tiled layout for the rank
                host = host.reshape((len(rows),) + sshape)
            x = jnp.asarray(host)
        if sshape and x.ndim == 2:
            x = x.reshape((x.shape[0],) + sshape)

        ids = tuple(id(c) for c in ready)
        if self._batched is not None and self._batched[0] == ids:
            states = self._batched[1]
        else:
            self._writeback()
            states = tuple(self._stack_states(ready, j)
                           for j in range(n_stages))
        uni_vals = tuple(tuple(c.stages[j].spec["uniforms"]()
                               for c in ready)
                         for j in range(n_stages))
        if self._uni_cache is not None \
                and self._uni_cache[0] == (ids, uni_vals):
            unis = self._uni_cache[1]
        else:
            def dev_uniform(vals):
                # lane-uniform values ship as SCALARS: a (B, 1)
                # broadcast can block XLA fusion in composed video
                # graphs (measured 4x slower at 4K)
                if len(set(vals)) == 1:
                    return jnp.float64(vals[0])
                return jnp.asarray(np.asarray(vals,
                                              np.float64)[:, None])
            unis = tuple(
                tuple(dev_uniform(u) for u in zip(*uni_vals[j]))
                for j in range(n_stages))
            self._uni_cache = ((ids, uni_vals), unis)
        fn = prime if priming else step
        states, out, aux = fn(states, x, unis)
        self._batched = (ids, states)
        aux = [AuxView(a) if isinstance(a, dict) else a for a in aux]
        for c in ready:
            c.primed = True
        # keep the incremental readiness mirror exact: the fired
        # heads just consumed a block (and may have flipped primed,
        # which changes their need)
        for c in ready:
            h = c.head
            now = h.active and self._avail(h) >= self._need(c)
            if now != h.ready:
                h.ready = now
                self._n_ready += 1 if now else -1
        self.fire_count += 1
        CAT.log(f"context {self.name}: fired batch of {len(ready)} "
                f"chains x {n} ({'prime' if priming else 'step'}, "
                f"total {self.fire_count})")
        packet = (out, aux, metas, dev_in)
        if self.depth <= 1:
            self._distribute(*packet)
        else:
            prev, self._pending_fire = self._pending_fire, packet
            if prev is not None:
                self._distribute(*prev)

    def _distribute(self, out, aux, metas, device: bool) -> None:
        out_n = int(np.prod(out.shape[1:]))
        host = None if device else np.asarray(out)
        for i, (c, _pts) in enumerate(metas):
            if not c.head.active:
                continue
            # per-stage aux (metering) to the owning elements — every
            # member folded into the stage gets an offer (a fused
            # loudnorm+ebur stage's meters belong to the ebur element)
            for j, stg in enumerate(c.stages):
                if aux[j] is None:
                    continue
                for m in stg.members:
                    if hasattr(m.element, "consume_batch_aux"):
                        m.element.consume_batch_aux(aux[j], i,
                                                    c.out_pts, out_n)
            tail = c.tail
            dur = out_n * SECOND // max(c.head.rate, 1)
            pts = c.out_pts
            if pts is not None:
                c.out_pts = pts + dur
            payload = DeviceRow(out, i) if device \
                else host[i].astype(c.head.dtype, copy=False)
            buf = tail.element.make_batch_buffer(payload, pts, dur)
            tail.element.srcpad.push(buf)

    # -- EOS / flush ------------------------------------------------------
    def flush_pending(self) -> None:
        if self._pending_fire is not None:
            self._distribute(*self._pending_fire)
            self._pending_fire = None

    def flush_member(self, element) -> list[Buffer]:
        """Drain a chain at EOS (called with its HEAD element): flush
        any overlapped batch, then run the chain's padded tail at B=1
        (other chains' states are untouched — state rows are
        independent).  A trailing partial block is zero-padded and the
        output truncated to the real sample count."""
        m = self.member_for(element)
        if m is None:
            return []
        if self.chains is None and not self._build_chains():
            m.active = False
            return []
        chain = next((c for c in self.chains if c.head is m), None)
        if chain is None or m.spec is None:
            m.active = False
            self.try_fire()
            return []
        self.flush_pending()
        self._writeback()
        import jax
        import jax.numpy as jnp
        step, prime, n_stages, _final = self._fused

        def _b1_states():
            return tuple(
                jax.tree_util.tree_map(lambda leaf: leaf[None],
                                       chain.stages[j].owner.state)
                for j in range(n_stages))

        def _b1_unis():
            return tuple(
                tuple(jnp.asarray(np.asarray([u], np.float64)[:, None])
                      for u in chain.stages[j].spec["uniforms"]())
                for j in range(n_stages))

        def _store(states):
            for j in range(n_stages):
                chain.stages[j].owner.state = jax.tree_util.tree_map(
                    lambda leaf: leaf[0], states[j])

        def _emit(host_row, emit):
            dur = emit * SECOND // max(m.rate, 1)
            pts = chain.out_pts
            if pts is not None:
                chain.out_pts = pts + dur
            out_bufs.append(chain.tail.element.make_batch_buffer(
                host_row.astype(m.dtype, copy=False), pts, dur))

        out_bufs: list[Buffer] = []
        while self._avail(m) > 0:
            need = self._need(chain)
            avail = self._avail(m)
            if _final is not None and chain.primed and avail < need:
                break                # partial tail: the FINAL drain
            n = min(avail, need)
            hspec = chain.stages[0].spec
            sshape = tuple(hspec.get("sample_shape") or ())
            row, is_dev = self._take_input(m, n)
            if is_dev:
                xr = row.jax() if isinstance(row, DeviceRow) else row
                if xr.ndim == 1:
                    xr = jnp.pad(xr, (0, need - n)) if n < need else xr
                    if sshape:
                        xr = xr.reshape(sshape)
                x = xr[None]
            else:
                hx = np.pad(row.astype(
                    hspec.get("compute_dtype", np.float64),
                    copy=False), (0, need - n))
                if sshape:
                    hx = hx.reshape(sshape)
                x = jnp.asarray(hx[None])
            states = _b1_states()
            unis = _b1_unis()
            fn = prime if not chain.primed else step
            states, out, aux = fn(states, x, unis)
            chain.primed = True
            _store(states)
            out_row = np.asarray(out)[0].reshape(-1)
            emit = min(out_row.size, n) \
                if out_row.size == need else out_row.size
            _emit(out_row[:emit], emit)
        if _final is not None and chain.primed:
            # device FINAL drain (ops/loudnorm_dev.make_final_step):
            # consume the trailing partial block and emit the whole
            # gain-lookahead tail with host-element semantics
            n = self._avail(m)
            block = self.block
            if n > 0:
                row, is_dev = self._take_input(m, n)
                if is_dev:
                    xr = row.jax() if isinstance(row, DeviceRow) \
                        else row
                    x = jnp.pad(xr, (0, block - n))[None]
                else:
                    cdtype = m.spec.get("compute_dtype", np.float64)
                    x = jnp.asarray(np.pad(
                        row.astype(cdtype, copy=False),
                        (0, block - n))[None])
            else:
                cdtype = m.spec.get("compute_dtype", np.float64)
                x = jnp.zeros((1, block), cdtype)
            states, out, out_valid = _final(
                _b1_states(), x, jnp.int32(n), _b1_unis())
            _store(states)
            emit = int(out_valid)       # flat samples
            _emit(np.asarray(out)[0][:emit], emit)
        m.active = False
        # remaining chains may all be ready now
        self.try_fire()
        if len(chain.members) > 1:
            # multi-element chain: outputs belong at the TAIL's src
            # pad (returning them would re-enter the chain's own
            # intermediate elements as input)
            for b in out_bufs:
                chain.tail.element.srcpad.push(b)
            return []
        return out_bufs


# ---------------------------------------------------------------------------
# checkpoint/resume (SURVEY §5.4: resumable stream state — a
# replacement process/chip restores member states and continues
# bit-exact; gstpu/parallel/checkpoint.py does the array IO)
# ---------------------------------------------------------------------------

def snapshot_context(ctx: DeviceContext, path: str) -> None:
    """Checkpoint every finalized member's carried kernel state plus
    its pending re-block bytes."""
    from gstpu.parallel.checkpoint import checkpoint
    ctx._writeback()
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
    ctx._writeback()
    ctx._batched = None
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
