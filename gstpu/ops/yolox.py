"""JAX YOLOX-style detector forward pass (TPU compute path).

Rebuilds the compute of the reference burn-yoloxinference
(analytics/burn/src/yoloxinference): conv backbone -> 3 FPN levels
(strides 8/16/32) -> decoupled YOLOX heads emitting one
(n_anchors, 5 + num_classes) tensor whose layout matches
gstpu.ops.detection.yolox_grids (row-major per level, levels in
stride order).  The architecture here is a compact CSP-style stack
("nano-lite") rather than the full CSPDarknet: weights load from
.npz (`model-file`), with a deterministic random init for testing.
All matmuls/convs run under jit — on TPU they map onto the MXU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

CHANNELS = (16, 32, 64, 128)        # stem + strides 8/16/32


def _conv_shapes(num_classes: int):
    """name -> (kh, kw, cin, cout) for every conv in the graph."""
    c = CHANNELS
    shapes = {
        "stem": (3, 3, 3, c[0]),          # stride 2
        "down1": (3, 3, c[0], c[1]),      # stride 2 -> /4
        "down2": (3, 3, c[1], c[2]),      # stride 2 -> /8
        "mix2": (3, 3, c[2], c[2]),
        "down3": (3, 3, c[2], c[3]),      # stride 2 -> /16
        "mix3": (3, 3, c[3], c[3]),
        "down4": (3, 3, c[3], c[3]),      # stride 2 -> /32
        "mix4": (3, 3, c[3], c[3]),
    }
    for i, cin in ((2, c[2]), (3, c[3]), (4, c[3])):
        shapes[f"head{i}"] = (1, 1, cin, 5 + num_classes)
    return shapes


def init_params(num_classes: int = 80, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    params = {}
    for name, (kh, kw, cin, cout) in _conv_shapes(num_classes).items():
        scale = (2.0 / (kh * kw * cin)) ** 0.5
        params[f"{name}/w"] = rng.normal(
            0, scale, (kh, kw, cin, cout)).astype(np.float32)
        params[f"{name}/b"] = np.zeros(cout, np.float32)
    return params


def save_params(path: str, params: dict) -> None:
    np.savez(path, **params)


def load_params(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _conv(x, params, name, stride=1):
    w = params[f"{name}/w"]
    b = params[f"{name}/b"]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.silu(y + b)


def _head(x, params, name):
    w = params[f"{name}/w"]
    b = params[f"{name}/b"]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    # reg (4): raw; obj + cls: sigmoid, matching YOLOX decode
    return jnp.concatenate([y[..., :4],
                            jax.nn.sigmoid(y[..., 4:])], axis=-1)


@partial(jax.jit, static_argnames=())
def yolox_forward(params: dict, img: jax.Array) -> jax.Array:
    """img: (H, W, 3) float32 in [0, 1] -> (A, 5 + C)."""
    x = img[None]
    x = _conv(x, params, "stem", 2)
    x = _conv(x, params, "down1", 2)
    p8 = _conv(_conv(x, params, "down2", 2), params, "mix2")
    p16 = _conv(_conv(p8, params, "down3", 2), params, "mix3")
    p32 = _conv(_conv(p16, params, "down4", 2), params, "mix4")
    outs = []
    for lvl, name in ((p8, "head2"), (p16, "head3"), (p32, "head4")):
        y = _head(lvl, params, name)
        outs.append(y.reshape(-1, y.shape[-1]))
    return jnp.concatenate(outs, axis=0)
