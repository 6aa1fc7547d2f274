"""Stream-state checkpoint / resume for fused device chains.

SURVEY §5.3's TPU mapping: fallbackswitch/fallbacksrc become host
supervisors over device streams, "add checkpointed stream state so a
replacement chip/host can resume" — the reference restarts within one
process, but a TPU fleet swaps chips/hosts.  A chain's state is a
pytree of device arrays; checkpoint() snapshots it host-side (npz;
orbax works the same way but npz has no async machinery to leak in
tests), restore() places it on whatever devices/sharding the new
chain uses.  Bit-exact: resuming mid-stream continues with the same
samples the uninterrupted run would produce.
"""

from __future__ import annotations

import numpy as np

import jax


def state_to_host(state) -> dict:
    """Pytree of (possibly sharded) device arrays -> flat dict of
    numpy arrays + treedef repr for integrity checking."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    out = {f"leaf_{i}": np.asarray(leaf)
           for i, leaf in enumerate(leaves)}
    out["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    return out


def checkpoint(path: str, state, step: int = 0) -> None:
    host = state_to_host(state)
    host["__step__"] = np.int64(step)
    np.savez(path, **host)


def restore(path: str, like_state, *, sharding=None):
    """-> (state, step).  `like_state` supplies the pytree structure;
    `sharding` (optional jax.sharding.Sharding or pytree of them)
    re-places leaves for the replacement mesh."""
    with np.load(path) as z:
        treedef_repr = bytes(z["__treedef__"]).decode()
        leaves_like, treedef = jax.tree_util.tree_flatten(like_state)
        if str(treedef) != treedef_repr:
            raise ValueError(
                f"checkpoint structure mismatch: saved {treedef_repr}"
                f" vs chain {treedef}")
        leaves = []
        for i, like in enumerate(leaves_like):
            arr = z[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(like.shape):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != "
                    f"chain {like.shape}")
            if arr.dtype != np.dtype(like.dtype):
                raise ValueError(
                    f"leaf {i}: checkpoint dtype {arr.dtype} != "
                    f"chain {like.dtype} (silent cast would break "
                    f"bit-exact resume)")
            if sharding is not None:
                sh = (sharding if not isinstance(sharding, (list,
                                                            tuple))
                      else sharding[i])
                leaves.append(jax.device_put(arr, sh))
            else:
                leaves.append(jax.device_put(arr))
        step = int(z["__step__"])
    return jax.tree_util.tree_unflatten(treedef, leaves), step
