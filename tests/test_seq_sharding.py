"""Sequence-axis sharding of the REAL chain front (VERDICT r2 item
7): the exact echo FIR (ppermute halo) and the BS.1770 K-weighting
IIR cascade (all-gathered state superposition) sharded over the seq
mesh axis must match the unsharded computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh8():
    from gstpu.parallel.streams import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(2, 4)


def test_seq_sharded_kweight_matches_unsharded(mesh8):
    from gstpu.parallel.streams import (kweight_unsharded,
                                        make_seq_sharded_kweight)
    seg = 1920
    kw = make_seq_sharded_kweight(mesh8, seg_len=seg)
    gold = kweight_unsharded()
    B = 4
    rng = np.random.default_rng(0)
    zs = jnp.zeros((B, 2, 2))
    zg = jnp.zeros((B, 2, 2))
    for blk in range(3):                  # carried state across blocks
        x = jnp.asarray(rng.standard_normal((B, 4 * seg)))
        zs, ys = kw(zs, x)
        zg, yg = gold(zg, x)
        assert float(jnp.abs(ys - yg).max()) < 1e-8, blk
    assert float(jnp.abs(zs - zg).max()) < 1e-8


def test_seq_sharded_chain_front_matches_unsharded(mesh8):
    """echo FIR -> K-weighting, both seq-sharded, vs the unsharded
    ops — the loudnorm chain's measurement front end to end."""
    from gstpu.ops.echo import echo_block, make_state
    from gstpu.parallel.streams import (kweight_unsharded,
                                        make_seq_sharded_fir_echo,
                                        make_seq_sharded_kweight)
    seg, delay = 1920, 960
    B = 4
    fir = make_seq_sharded_fir_echo(mesh8, delay=delay, seg_len=seg)
    kw = make_seq_sharded_kweight(mesh8, seg_len=seg)
    gold = kweight_unsharded()

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 4 * seg)))
    tail = jnp.zeros((B, delay))
    tail_s, mid_s = fir(tail, x, jnp.float64(0.4))
    z = jnp.zeros((B, 2, 2))
    _, y_s = kw(z, mid_s)

    tail_u = make_state((B,), delay)
    tail_u, mid_u = echo_block(tail_u, x, jnp.float64(0.4),
                               jnp.float64(0.0), delay=delay)
    assert float(jnp.abs(mid_s - mid_u).max()) == 0.0   # FIR: exact
    _, y_u = gold(jnp.zeros((B, 2, 2)), mid_u)
    assert float(jnp.abs(y_s - y_u).max()) < 1e-8
