"""yolox forward + yoloxinference element tests."""

import numpy as np
import pytest

from gstpu import State, parse_launch
from gstpu.ops.yolox import (init_params, load_params, save_params,
                             yolox_forward)


def test_forward_shape_matches_grids():
    from gstpu.ops.detection import yolox_grids
    import jax.numpy as jnp
    params = init_params(num_classes=3, seed=1)
    img = np.zeros((64, 96, 3), np.float32)
    out = np.asarray(yolox_forward(params, jnp.asarray(img)))
    grids, _ = yolox_grids(96, 64)
    assert out.shape == (grids.shape[0], 5 + 3)
    # obj/cls channels are sigmoided into (0, 1)
    assert (out[:, 4:] > 0).all() and (out[:, 4:] < 1).all()


def test_params_npz_roundtrip(tmp_path):
    import jax.numpy as jnp
    p = init_params(num_classes=2, seed=7)
    f = tmp_path / "w.npz"
    save_params(str(f), p)
    q = load_params(str(f))
    assert sorted(p) == sorted(q)
    img = np.random.default_rng(0).random((32, 32, 3),
                                          dtype=np.float32)
    a = np.asarray(yolox_forward(p, jnp.asarray(img)))
    b = np.asarray(yolox_forward(q, jnp.asarray(img)))
    assert (a == b).all()


def test_inference_pipeline_attaches_detections(tmp_path):
    from gstpu.elements.analytics.analytics import (
        AnalyticsRelationMeta, TensorMeta)
    p = parse_launch(
        "videotestsrc num-buffers=2 pattern=gradient ! "
        "video/x-raw, format=RGB, width=64, height=64, "
        "framerate=30/1 ! yoloxinference num_classes=2 ! "
        "yoloxtensordec num_classes=2 score_threshold=0.05 ! "
        "appsink name=out")
    out = p.get_by_name("out")
    p.set_state(State.PLAYING)
    p.run()
    bufs = out.pull_all()
    assert len(bufs) == 2
    for b in bufs:
        tm = b.get_meta(TensorMeta)
        assert tm is not None and tm.data.shape == (84, 7)
        rm = b.get_meta(AnalyticsRelationMeta)
        assert rm is not None
        for d in rm.detections:
            assert 0 <= d.score <= 1
            assert d.class_id in (0, 1)
    p.set_state(State.NULL)
