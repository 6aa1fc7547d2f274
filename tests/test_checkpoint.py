"""Stream checkpoint/resume: a replacement 'chip' continues
bit-exact (SURVEY §5.3 TPU mapping)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gstpu.parallel.chains import make_audiofx_chain
from gstpu.parallel.checkpoint import checkpoint, restore


def _run(step, state, blocks, params):
    outs = []
    for x in blocks:
        state, out, _loud = step(state, x, *params)
        outs.append(np.asarray(out))
    return state, outs


def test_resume_bit_exact(tmp_path):
    rate, delay, tail, block = 8000, 400, 400, 2000
    B = 4
    step, mk = make_audiofx_chain(rate, delay, tail, block=block)
    init_state = mk(B)
    params = (jnp.float32(0.4), jnp.float32(0.3), jnp.float32(0.1))
    rng = np.random.default_rng(0)
    blocks = [jnp.asarray(rng.standard_normal((B, block)) * 0.1,
                          dtype=jnp.float32) for _ in range(6)]

    # uninterrupted reference (donated args: rebuild for each run)
    state, ref_outs = _run(step, init_state, blocks, params)

    # run 3 blocks, checkpoint, 'lose the chip', restore, continue
    step2, mk2 = make_audiofx_chain(rate, delay, tail, block=block)
    st, first = _run(step2, mk2(B), blocks[:3], params)
    checkpoint(str(tmp_path / "ck.npz"), st, step=3)

    step3, mk3 = make_audiofx_chain(rate, delay, tail, block=block)
    restored, n = restore(str(tmp_path / "ck.npz"), mk3(B))
    assert n == 3
    _, rest = _run(step3, restored, blocks[3:], params)

    for a, b in zip(ref_outs, first + rest):
        assert (a == b).all()          # bit-exact resume


def test_restore_rejects_mismatch(tmp_path):
    step, mk = make_audiofx_chain(8000, 400, 400, block=2000)
    state = mk(4)
    x = jnp.zeros((4, 2000), jnp.float32)
    state, _, _ = step(state, x, jnp.float32(0.4), jnp.float32(0.3),
                       jnp.float32(0.1))
    checkpoint(str(tmp_path / "ck.npz"), state)
    _, mko = make_audiofx_chain(8000, 800, 800, block=2000)
    with pytest.raises(ValueError, match="shape"):
        restore(str(tmp_path / "ck.npz"), mko(4))


def test_restore_onto_mesh(tmp_path):
    """Restore places state onto an explicit sharding (the
    replacement-host path)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    step, mk = make_audiofx_chain(8000, 400, 400, block=2000)
    state = mk(8)
    x = jnp.zeros((8, 2000), jnp.float32)
    state, _, _ = step(state, x, jnp.float32(0.4), jnp.float32(0.3),
                       jnp.float32(0.1))
    checkpoint(str(tmp_path / "ck.npz"), state)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("stream",))
    sh = NamedSharding(mesh, P("stream"))
    _, mk4 = make_audiofx_chain(8000, 400, 400, block=2000)
    restored, _ = restore(str(tmp_path / "ck.npz"), mk4(8),
                          sharding=sh)
    for leaf in jax.tree_util.tree_leaves(restored):
        assert leaf.sharding == sh


def test_restore_rejects_dtype_mismatch(tmp_path):
    """ADVICE r1: a checkpoint whose leaves differ in dtype must not
    restore silently (device_put casting would break bit-exactness)."""
    state = {"a": jnp.zeros((4,), jnp.float32)}
    checkpoint(str(tmp_path / "ck.npz"), state)
    like = {"a": jnp.zeros((4,), jnp.float64)}
    with pytest.raises(ValueError, match="dtype"):
        restore(str(tmp_path / "ck.npz"), like)
