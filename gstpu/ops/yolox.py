"""JAX YOLOX forward pass (TPU compute path) — full architecture.

Rebuilds the model of the reference burn-yoloxinference
(analytics/burn/src/yoloxinference/yolox_burn/model/: darknet.rs,
bottleneck.rs, pafpn.rs, head.rs): Focus stem -> CSPDarknet
(dark2..dark5 with SPP) -> PAFPN neck -> decoupled YOLOX head.

Parameters are stored under the official YOLOX state-dict names
("backbone.backbone.dark2.0.conv.weight", "head.cls_preds.0.bias",
...) so real Megvii checkpoints load 1:1: `load_torch_checkpoint`
reads a .pth via torch (OIHW conv weights -> HWIO) — the same weight
contract the reference gets from burn-import (model/weights.rs).

Output: (n_anchors, 5 + num_classes) raw logits whose row layout
matches gstpu.ops.detection.yolox_grids (levels in stride order
8/16/32, row-major per level); gstpu.ops.detection.yolox_decode
applies grid/stride/sigmoid.

Everything runs under one jit — convs map onto the MXU on TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# (depth, width, depthwise) per model size, reference darknet.rs /
# official YOLOX exps
PRESETS = {
    "nano": (0.33, 0.25, True),
    "tiny": (0.33, 0.375, False),
    "s": (0.33, 0.50, False),
    "m": (0.67, 0.75, False),
    "l": (1.0, 1.0, False),
    "x": (1.33, 1.25, False),
}

BN_EPS = 1e-3  # YOLOX BaseConv uses BatchNorm2d(eps=1e-3)


def _expand(ch: int, width: float) -> int:
    return int(ch * width)


def _base_depth(depth: float) -> int:
    return max(round(depth * 3), 1)


# ---------------------------------------------------------------------------
# parameter-tree construction (official state-dict names)
# ---------------------------------------------------------------------------

class _Shapes:
    """Collects (name -> shape) for every parameter in the graph."""

    def __init__(self):
        self.shapes: dict[str, tuple] = {}

    def base_conv(self, p: str, cin: int, cout: int, k: int,
                  groups: int = 1):
        self.shapes[f"{p}.conv.weight"] = (k, k, cin // groups, cout)
        for s in ("weight", "bias", "running_mean", "running_var"):
            self.shapes[f"{p}.bn.{s}"] = (cout,)

    def conv(self, p: str, cin: int, cout: int, k: int,
             depthwise: bool):
        if depthwise:
            self.base_conv(f"{p}.dconv", cin, cin, k, groups=cin)
            self.base_conv(f"{p}.pconv", cin, cout, 1)
        else:
            self.base_conv(p, cin, cout, k)

    def plain_conv(self, p: str, cin: int, cout: int, k: int):
        self.shapes[f"{p}.weight"] = (k, k, cin, cout)
        self.shapes[f"{p}.bias"] = (cout,)

    def csp_layer(self, p: str, cin: int, cout: int, n: int,
                  expansion: float, depthwise: bool):
        hidden = int(cout * expansion)
        self.base_conv(f"{p}.conv1", cin, hidden, 1)
        self.base_conv(f"{p}.conv2", cin, hidden, 1)
        self.base_conv(f"{p}.conv3", 2 * hidden, cout, 1)
        for i in range(n):
            self.base_conv(f"{p}.m.{i}.conv1", hidden, hidden, 1)
            self.conv(f"{p}.m.{i}.conv2", hidden, hidden, 3, depthwise)

    def spp(self, p: str, cin: int, cout: int):
        hidden = cin // 2
        self.base_conv(f"{p}.conv1", cin, hidden, 1)
        self.base_conv(f"{p}.conv2", hidden * 4, cout, 1)


def _build_shapes(num_classes: int, depth: float, width: float,
                  depthwise: bool) -> dict[str, tuple]:
    s = _Shapes()
    c = _expand(64, width)
    d = _base_depth(depth)
    bb = "backbone.backbone"
    # Focus stem: conv over 12 channels (4x space-to-depth of RGB)
    s.base_conv(f"{bb}.stem.conv", 12, c, 3)
    # dark2..dark5 (darknet.rs CspBlock: conv s2 [+ spp] + csp)
    s.conv(f"{bb}.dark2.0", c, c * 2, 3, depthwise)
    s.csp_layer(f"{bb}.dark2.1", c * 2, c * 2, d, 0.5, depthwise)
    s.conv(f"{bb}.dark3.0", c * 2, c * 4, 3, depthwise)
    s.csp_layer(f"{bb}.dark3.1", c * 4, c * 4, d * 3, 0.5, depthwise)
    s.conv(f"{bb}.dark4.0", c * 4, c * 8, 3, depthwise)
    s.csp_layer(f"{bb}.dark4.1", c * 8, c * 8, d * 3, 0.5, depthwise)
    s.conv(f"{bb}.dark5.0", c * 8, c * 16, 3, depthwise)
    s.spp(f"{bb}.dark5.1", c * 16, c * 16)
    s.csp_layer(f"{bb}.dark5.2", c * 16, c * 16, d, 0.5, depthwise)
    # PAFPN (pafpn.rs / official YOLOPAFPN)
    nk = "backbone"
    s.base_conv(f"{nk}.lateral_conv0", c * 16, c * 8, 1)
    s.csp_layer(f"{nk}.C3_p4", c * 16, c * 8, d, 0.5, depthwise)
    s.base_conv(f"{nk}.reduce_conv1", c * 8, c * 4, 1)
    s.csp_layer(f"{nk}.C3_p3", c * 8, c * 4, d, 0.5, depthwise)
    s.conv(f"{nk}.bu_conv2", c * 4, c * 4, 3, depthwise)
    s.csp_layer(f"{nk}.C3_n3", c * 8, c * 8, d, 0.5, depthwise)
    s.conv(f"{nk}.bu_conv1", c * 8, c * 8, 3, depthwise)
    s.csp_layer(f"{nk}.C3_n4", c * 16, c * 16, d, 0.5, depthwise)
    # decoupled head (head.rs / official YOLOXHead), 256*width stems
    hc = _expand(256, width)
    for i, cin in enumerate((c * 4, c * 8, c * 16)):
        s.base_conv(f"head.stems.{i}", cin, hc, 1)
        for j in range(2):
            s.conv(f"head.cls_convs.{i}.{j}", hc, hc, 3, depthwise)
            s.conv(f"head.reg_convs.{i}.{j}", hc, hc, 3, depthwise)
        s.plain_conv(f"head.cls_preds.{i}", hc, num_classes, 1)
        s.plain_conv(f"head.reg_preds.{i}", hc, 4, 1)
        s.plain_conv(f"head.obj_preds.{i}", hc, 1, 1)
    return s.shapes


def init_params(num_classes: int = 80, seed: int = 0,
                size: str = "tiny") -> dict:
    """Deterministic random parameters (for tests / no-weights mode)."""
    depth, width, depthwise = PRESETS[size]
    rng = np.random.default_rng(seed)
    params = {}
    for name, shape in _build_shapes(num_classes, depth, width,
                                     depthwise).items():
        if name.endswith(("running_var", "bn.weight")):
            params[name] = np.ones(shape, np.float32)
        elif len(shape) == 1:
            params[name] = np.zeros(shape, np.float32)
        else:
            fan_in = shape[0] * shape[1] * shape[2]
            params[name] = rng.normal(
                0, (2.0 / fan_in) ** 0.5, shape).astype(np.float32)
    params["__meta__"] = np.array(
        [num_classes, {k: i for i, k in enumerate(PRESETS)}[size]],
        np.int32)
    return params


def save_params(path: str, params: dict) -> None:
    np.savez(path, **params)


def load_params(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_torch_checkpoint(path: str, num_classes: int = 80,
                          size: str = "s") -> dict:
    """Load an official YOLOX .pth checkpoint (Megvii format: a dict
    with a 'model' state dict, conv weights OIHW)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    depth, width, depthwise = PRESETS[size]
    shapes = _build_shapes(num_classes, depth, width, depthwise)
    params = {}
    for name, shape in shapes.items():
        t = state.get(name)
        if t is None:
            raise KeyError(f"checkpoint missing {name!r}")
        a = t.detach().cpu().numpy().astype(np.float32)
        if a.ndim == 4:            # OIHW -> HWIO
            a = np.transpose(a, (2, 3, 1, 0))
            if a.shape != tuple(shape):
                raise ValueError(
                    f"{name}: {a.shape} != expected {shape}")
        params[name] = a
    params["__meta__"] = np.array(
        [num_classes, {k: i for i, k in enumerate(PRESETS)}[size]],
        np.int32)
    return params


def params_meta(params: dict) -> tuple[int, str]:
    meta = params.get("__meta__")
    if meta is None:
        return 80, "tiny"
    sizes = list(PRESETS)
    return int(meta[0]), sizes[int(meta[1])]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _bn(x, p, prefix):
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    gamma = p[f"{prefix}.weight"]
    beta = p[f"{prefix}.bias"]
    return (x - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta


def _base_conv(x, p, prefix, stride=1, groups=1):
    w = p[f"{prefix}.conv.weight"]
    # explicit (k-1)//2 padding like torch Conv2d — XLA "SAME" pads
    # asymmetrically at stride 2, which would break weight parity
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return jax.nn.silu(_bn(y, p, f"{prefix}.bn"))


def _conv(x, p, prefix, stride=1, depthwise=False):
    if depthwise:
        x = _base_conv(x, p, f"{prefix}.dconv", stride,
                       groups=x.shape[-1])
        return _base_conv(x, p, f"{prefix}.pconv", 1)
    return _base_conv(x, p, prefix, stride)


def _plain_conv(x, p, prefix):
    w = p[f"{prefix}.weight"]
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p[f"{prefix}.bias"]


def _csp_layer(x, p, prefix, n, shortcut, depthwise):
    a = _base_conv(x, p, f"{prefix}.conv1")
    b = _base_conv(x, p, f"{prefix}.conv2")
    for i in range(n):
        ident = a
        a = _base_conv(a, p, f"{prefix}.m.{i}.conv1")
        a = _conv(a, p, f"{prefix}.m.{i}.conv2", 1, depthwise)
        if shortcut:
            a = a + ident
    return _base_conv(jnp.concatenate([a, b], -1), p,
                      f"{prefix}.conv3")


def _maxpool_same(x, k):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)])


def _spp(x, p, prefix):
    x = _base_conv(x, p, f"{prefix}.conv1")
    pools = [x] + [_maxpool_same(x, k) for k in (5, 9, 13)]
    return _base_conv(jnp.concatenate(pools, -1), p,
                      f"{prefix}.conv2")


def _focus(x, p, prefix):
    """Space-to-depth stem; patch order matches official YOLOX
    (top-left, bottom-left, top-right, bottom-right)."""
    tl = x[:, ::2, ::2, :]
    bl = x[:, 1::2, ::2, :]
    tr = x[:, ::2, 1::2, :]
    br = x[:, 1::2, 1::2, :]
    x = jnp.concatenate([tl, bl, tr, br], -1)
    return _base_conv(x, p, f"{prefix}.conv")


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


@partial(jax.jit, static_argnames=("n_depth", "depthwise"))
def _forward(params: dict, img: jax.Array, n_depth: int,
             depthwise: bool) -> jax.Array:
    p = params
    x = img[None] if img.ndim == 3 else img
    bb = "backbone.backbone"
    d = n_depth
    # CSPDarknet
    x = _focus(x, p, f"{bb}.stem")
    x = _conv(x, p, f"{bb}.dark2.0", 2, depthwise)
    x = _csp_layer(x, p, f"{bb}.dark2.1", d, True, depthwise)
    x = _conv(x, p, f"{bb}.dark3.0", 2, depthwise)
    f1 = _csp_layer(x, p, f"{bb}.dark3.1", d * 3, True, depthwise)
    x = _conv(f1, p, f"{bb}.dark4.0", 2, depthwise)
    f2 = _csp_layer(x, p, f"{bb}.dark4.1", d * 3, True, depthwise)
    x = _conv(f2, p, f"{bb}.dark5.0", 2, depthwise)
    x = _spp(x, p, f"{bb}.dark5.1")
    f3 = _csp_layer(x, p, f"{bb}.dark5.2", d, False, depthwise)
    # PAFPN
    nk = "backbone"
    fpn_out0 = _base_conv(f3, p, f"{nk}.lateral_conv0")
    x = jnp.concatenate([_upsample2(fpn_out0), f2], -1)
    f_out0 = _csp_layer(x, p, f"{nk}.C3_p4", d, False, depthwise)
    fpn_out1 = _base_conv(f_out0, p, f"{nk}.reduce_conv1")
    x = jnp.concatenate([_upsample2(fpn_out1), f1], -1)
    pan_out2 = _csp_layer(x, p, f"{nk}.C3_p3", d, False, depthwise)
    x = _conv(pan_out2, p, f"{nk}.bu_conv2", 2, depthwise)
    x = jnp.concatenate([x, fpn_out1], -1)
    pan_out1 = _csp_layer(x, p, f"{nk}.C3_n3", d, False, depthwise)
    x = _conv(pan_out1, p, f"{nk}.bu_conv1", 2, depthwise)
    x = jnp.concatenate([x, fpn_out0], -1)
    pan_out0 = _csp_layer(x, p, f"{nk}.C3_n4", d, False, depthwise)
    # decoupled head; per level emit (reg4 | obj1 | cls C) raw logits
    outs = []
    for i, feat in enumerate((pan_out2, pan_out1, pan_out0)):
        s = _base_conv(feat, p, f"head.stems.{i}")
        cls = s
        for j in range(2):
            cls = _conv(cls, p, f"head.cls_convs.{i}.{j}", 1,
                        depthwise)
        reg = s
        for j in range(2):
            reg = _conv(reg, p, f"head.reg_convs.{i}.{j}", 1,
                        depthwise)
        cls_out = _plain_conv(cls, p, f"head.cls_preds.{i}")
        reg_out = _plain_conv(reg, p, f"head.reg_preds.{i}")
        obj_out = _plain_conv(reg, p, f"head.obj_preds.{i}")
        y = jnp.concatenate([reg_out, obj_out, cls_out], -1)
        outs.append(y.reshape(y.shape[0], -1, y.shape[-1]))
    return jnp.concatenate(outs, axis=1)[0]


def yolox_forward(params: dict, img: jax.Array,
                  size: str | None = None) -> jax.Array:
    """img: (H, W, 3) float32 -> (A, 5 + C) raw logits."""
    _, psize = params_meta(params)
    size = size or psize
    depth, _, depthwise = PRESETS[size]
    p = {k: v for k, v in params.items() if k != "__meta__"}
    return _forward(p, img, _base_depth(depth), depthwise)
