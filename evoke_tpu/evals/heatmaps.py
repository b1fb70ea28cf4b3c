"""Attention heatmaps for generated tokens (observability, SURVEY §2.9).

Capability parity: EVOKE's cv2-JET heatmaps of decoder cross-attention per
generated token over the image (modules/utils.py:214-224, tester.py:94,
temp_tester.py:154). Implemented dependency-free: bilinear upsampling + a JET
colormap in numpy, blended 50/50 with the (denormalized) image exactly like the
reference's ``generate_heatmap``.

Attention maps come from flax intermediates: run the decoder with
``mutable=['intermediates']`` — every MultiHeadAttention sows its probs under
``.../attn`` (models/layers.py).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from evoke_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _bilinear_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = arr.shape
    ys = np.linspace(0, h - 1, out_h)
    xs = np.linspace(0, w - 1, out_w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = arr[np.ix_(y0, x0)]
    b = arr[np.ix_(y0, x1)]
    c = arr[np.ix_(y1, x0)]
    d = arr[np.ix_(y1, x1)]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """x in [0,1] -> [.., 3] RGB in [0,1] (cv2 COLORMAP_JET approximation)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization -> [0,1] RGB."""
    return np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


def token_heatmap(image: np.ndarray, patch_weights: np.ndarray) -> np.ndarray:
    """image: [H, W, 3] normalized; patch_weights: [P] cross-attn over patches
    (P must be a square grid). Returns the blended heatmap [H, W, 3] in [0,1]."""
    g = int(round(np.sqrt(patch_weights.shape[0])))
    assert g * g == patch_weights.shape[0], "patch grid must be square"
    w = patch_weights.reshape(g, g).astype(np.float64)
    w = w - w.min()
    w = w / max(w.max(), 1e-12)
    h, wd = image.shape[:2]
    up = _bilinear_resize(w, h, wd)
    heat = jet_colormap(up)
    base = denormalize_image(image)
    return 0.5 * heat + 0.5 * base


def extract_cross_attention(intermediates: Dict, layer: str = "dec_0",
                            sub: str = "src_attn") -> np.ndarray:
    """Pull a sown cross-attention map [B, h, Tq, Tk] out of flax intermediates."""
    node = intermediates
    for key in ("text_decoder", layer, sub, "attn"):
        if key in node:
            node = node[key]
    if isinstance(node, (tuple, list)):
        node = node[0]
    return np.asarray(node)


def generation_heatmaps(image: np.ndarray, cross_attn: np.ndarray,
                        token_positions: List[int], head: str = "mean"
                        ) -> List[np.ndarray]:
    """cross_attn: [h, Tq, P] for one sample; one blended heatmap per position."""
    att = cross_attn.mean(0) if head == "mean" else cross_attn[int(head)]
    return [token_heatmap(image, att[t]) for t in token_positions]
