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


def test_palm_rotation_reference_values():
    import math
    from gstpu.elements.analytics.analytics import \
        palm_rotation_from_keypoints
    # imp.rs:806 hand alignment offset test
    assert abs(palm_rotation_from_keypoints((0, 0), (1, 0))
               - math.pi / 2) < 1e-6


def test_handdetectiontensordec():
    import numpy as np
    from gstpu import Buffer
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.core.video import VideoInfo
    from gstpu.elements.analytics.analytics import (
        AnalyticsRelationMeta, TensorMeta)

    # two overlapping palms + one below threshold
    rows = np.array([
        [0.9, 0.5, 0.5, 0.1, 0.5, 0.55, 0.5, 0.45],
        [0.8, 0.51, 0.5, 0.1, 0.51, 0.55, 0.51, 0.45],   # overlaps
        [0.2, 0.2, 0.2, 0.1, 0.2, 0.25, 0.2, 0.15],      # low score
    ], np.float32)
    vi = VideoInfo("RGB", 192, 192)
    h = Harness(make("handdetectiontensordec"))
    h.set_caps("video/x-raw, format=RGB, width=192, height=192, "
               "framerate=30/1")
    b = vi.make_buffer(np.zeros((192, 192, 3), np.uint8))
    b.add_meta(TensorMeta(rows, "palm-detection"))
    h.push(b)
    rm = h.pull().get_meta(AnalyticsRelationMeta)
    assert len(rm.detections) == 1            # NMS merged, low cut
    d = rm.detections[0]
    assert d.label == "hand" and abs(d.w - 2.9 * 0.1 * 192) < 1e-3
    assert hasattr(d, "rotation")
    h.teardown()


def test_onvif_relationmeta_roundtrip():
    import numpy as np
    from gstpu import Buffer
    from gstpu.core.harness import Harness
    from gstpu.core.registry import make
    from gstpu.core.video import VideoInfo
    from gstpu.elements.analytics.analytics import \
        AnalyticsRelationMeta
    from gstpu.elements.net.onvif import OnvifMetadataFrameMeta
    from gstpu.ops.detection import Detection

    vi = VideoInfo("RGB", 100, 200)
    caps = ("video/x-raw, format=RGB, width=100, height=200, "
            "framerate=30/1")
    to_xml = Harness(make("relationmeta2onvifmeta"))
    to_xml.set_caps(caps)
    b = vi.make_buffer(np.zeros((200, 100, 3), np.uint8))
    b.add_meta(AnalyticsRelationMeta(
        [Detection(x=25, y=50, w=50, h=100, score=1.0, class_id=7)]))
    to_xml.push(b)
    out = to_xml.pull()
    om = out.get_meta(OnvifMetadataFrameMeta)
    assert om is not None and b"BoundingBox" in om.data
    to_xml.teardown()

    back = Harness(make("onvifmeta2relationmeta"))
    back.set_caps(caps)
    b2 = vi.make_buffer(np.zeros((200, 100, 3), np.uint8))
    b2.add_meta(om)
    back.push(b2)
    rm = back.pull().get_meta(AnalyticsRelationMeta)
    assert rm is not None and len(rm.detections) == 1
    d = rm.detections[0]
    assert (round(d.x), round(d.y), round(d.w), round(d.h),
            d.class_id) == (25, 50, 50, 100, 7)
    back.teardown()
