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
    # raw logits (yolox_decode applies grid/stride/sigmoid)
    assert np.isfinite(out).all()


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


# ---------------------------------------------------------------------------
# weight contract: an independent torch implementation of the official
# YOLOX architecture (Megvii naming) generates a .pth checkpoint; our
# loader + JAX forward must reproduce its output (reference loads the
# same checkpoints through burn-import, yolox_burn/model/weights.rs)
# ---------------------------------------------------------------------------

def _torch_yolox(num_classes, size):
    import torch
    import torch.nn as nn
    from gstpu.ops.yolox import PRESETS, _base_depth, _expand

    depth, width, depthwise = PRESETS[size]

    class BaseConv(nn.Module):
        def __init__(self, cin, cout, k, s, groups=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, (k - 1) // 2,
                                  groups=groups, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class DWConv(nn.Module):
        def __init__(self, cin, cout, k, s):
            super().__init__()
            self.dconv = BaseConv(cin, cin, k, s, groups=cin)
            self.pconv = BaseConv(cin, cout, 1, 1)

        def forward(self, x):
            return self.pconv(self.dconv(x))

    def Conv(cin, cout, k, s):
        return DWConv(cin, cout, k, s) if depthwise \
            else BaseConv(cin, cout, k, s)

    class Bottleneck(nn.Module):
        def __init__(self, cin, cout, shortcut):
            super().__init__()
            self.conv1 = BaseConv(cin, cout, 1, 1)
            self.conv2 = Conv(cout, cout, 3, 1)
            self.use_add = shortcut and cin == cout

        def forward(self, x):
            y = self.conv2(self.conv1(x))
            return x + y if self.use_add else y

    class CSPLayer(nn.Module):
        def __init__(self, cin, cout, n, shortcut):
            super().__init__()
            hidden = int(cout * 0.5)
            self.conv1 = BaseConv(cin, hidden, 1, 1)
            self.conv2 = BaseConv(cin, hidden, 1, 1)
            self.conv3 = BaseConv(2 * hidden, cout, 1, 1)
            self.m = nn.Sequential(*[Bottleneck(hidden, hidden,
                                                shortcut)
                                     for _ in range(n)])

        def forward(self, x):
            a = self.m(self.conv1(x))
            b = self.conv2(x)
            return self.conv3(torch.cat([a, b], 1))

    class SPP(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            hidden = cin // 2
            self.conv1 = BaseConv(cin, hidden, 1, 1)
            self.m = nn.ModuleList(
                [nn.MaxPool2d(k, 1, k // 2) for k in (5, 9, 13)])
            self.conv2 = BaseConv(hidden * 4, cout, 1, 1)

        def forward(self, x):
            x = self.conv1(x)
            return self.conv2(torch.cat(
                [x] + [m(x) for m in self.m], 1))

    class Focus(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = BaseConv(cin * 4, cout, 3, 1)

        def forward(self, x):
            tl = x[..., ::2, ::2]
            bl = x[..., 1::2, ::2]
            tr = x[..., ::2, 1::2]
            br = x[..., 1::2, 1::2]
            return self.conv(torch.cat([tl, bl, tr, br], 1))

    c = _expand(64, width)
    d = _base_depth(depth)

    class CSPDarknet(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = Focus(3, c)
            self.dark2 = nn.Sequential(Conv(c, c * 2, 3, 2),
                                       CSPLayer(c * 2, c * 2, d, True))
            self.dark3 = nn.Sequential(
                Conv(c * 2, c * 4, 3, 2),
                CSPLayer(c * 4, c * 4, d * 3, True))
            self.dark4 = nn.Sequential(
                Conv(c * 4, c * 8, 3, 2),
                CSPLayer(c * 8, c * 8, d * 3, True))
            self.dark5 = nn.Sequential(
                Conv(c * 8, c * 16, 3, 2),
                SPP(c * 16, c * 16),
                CSPLayer(c * 16, c * 16, d, False))

        def forward(self, x):
            x = self.stem(x)
            x = self.dark2(x)
            f1 = self.dark3(x)
            f2 = self.dark4(f1)
            f3 = self.dark5(f2)
            return f1, f2, f3

    class PAFPN(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = CSPDarknet()
            self.upsample = nn.Upsample(scale_factor=2,
                                        mode="nearest")
            self.lateral_conv0 = BaseConv(c * 16, c * 8, 1, 1)
            self.C3_p4 = CSPLayer(c * 16, c * 8, d, False)
            self.reduce_conv1 = BaseConv(c * 8, c * 4, 1, 1)
            self.C3_p3 = CSPLayer(c * 8, c * 4, d, False)
            self.bu_conv2 = Conv(c * 4, c * 4, 3, 2)
            self.C3_n3 = CSPLayer(c * 8, c * 8, d, False)
            self.bu_conv1 = Conv(c * 8, c * 8, 3, 2)
            self.C3_n4 = CSPLayer(c * 16, c * 16, d, False)

        def forward(self, x):
            f1, f2, f3 = self.backbone(x)
            fpn_out0 = self.lateral_conv0(f3)
            f_out0 = self.C3_p4(torch.cat(
                [self.upsample(fpn_out0), f2], 1))
            fpn_out1 = self.reduce_conv1(f_out0)
            pan_out2 = self.C3_p3(torch.cat(
                [self.upsample(fpn_out1), f1], 1))
            pan_out1 = self.C3_n3(torch.cat(
                [self.bu_conv2(pan_out2), fpn_out1], 1))
            pan_out0 = self.C3_n4(torch.cat(
                [self.bu_conv1(pan_out1), fpn_out0], 1))
            return pan_out2, pan_out1, pan_out0

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            hc = _expand(256, width)
            chans = (c * 4, c * 8, c * 16)
            self.stems = nn.ModuleList(
                [BaseConv(ci, hc, 1, 1) for ci in chans])
            self.cls_convs = nn.ModuleList(
                [nn.Sequential(Conv(hc, hc, 3, 1), Conv(hc, hc, 3, 1))
                 for _ in chans])
            self.reg_convs = nn.ModuleList(
                [nn.Sequential(Conv(hc, hc, 3, 1), Conv(hc, hc, 3, 1))
                 for _ in chans])
            self.cls_preds = nn.ModuleList(
                [nn.Conv2d(hc, num_classes, 1) for _ in chans])
            self.reg_preds = nn.ModuleList(
                [nn.Conv2d(hc, 4, 1) for _ in chans])
            self.obj_preds = nn.ModuleList(
                [nn.Conv2d(hc, 1, 1) for _ in chans])

        def forward(self, feats):
            outs = []
            for i, f in enumerate(feats):
                s = self.stems[i](f)
                cls = self.cls_convs[i](s)
                reg = self.reg_convs[i](s)
                y = torch.cat([self.reg_preds[i](reg),
                               self.obj_preds[i](reg),
                               self.cls_preds[i](cls)], 1)
                n, ch, h, w = y.shape
                outs.append(y.permute(0, 2, 3, 1).reshape(n, -1, ch))
            return torch.cat(outs, 1)

    class YOLOX(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = PAFPN()
            self.head = Head()

        def forward(self, x):
            return self.head(self.backbone(x))

    return YOLOX()


@pytest.mark.parametrize("size", ["nano", "tiny"])
def test_torch_checkpoint_parity(tmp_path, size):
    """Our JAX forward reproduces an official-architecture torch
    model loaded from its .pth checkpoint (proves real YOLOX weights
    load and run identically)."""
    import torch
    from gstpu.ops.yolox import load_torch_checkpoint, yolox_forward
    torch.manual_seed(3)
    num_classes = 5
    model = _torch_yolox(num_classes, size).eval()
    # randomize BN stats so the BN path is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)
            elif isinstance(m, torch.nn.Conv2d) \
                    and m.bias is not None:
                m.bias.uniform_(-0.1, 0.1)
    path = tmp_path / f"yolox_{size}.pth"
    torch.save({"model": model.state_dict()}, str(path))

    params = load_torch_checkpoint(str(path), num_classes, size)
    rng = np.random.default_rng(11)
    img = rng.random((64, 64, 3), dtype=np.float32)
    ours = np.asarray(yolox_forward(params, img))
    with torch.no_grad():
        theirs = model(torch.from_numpy(
            img.transpose(2, 0, 1)[None]))[0].numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
