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


def save_png(image01: np.ndarray, path: str) -> None:
    """Write an [H, W, 3] float image in [0, 1] as a PNG (PIL, no cv2)."""
    from PIL import Image

    Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8)).save(path)


def render_generation_heatmaps(model, state, batch: Dict, seqs: np.ndarray,
                               tokenizer, out_dir: str, num_layers: int,
                               study_ids: List[str] = None,
                               max_studies: int = 4,
                               with_indication: bool = False) -> List[str]:
    """The reference Tester.plot surface (tester.py:94-120): per decoder layer,
    per generated token, a JET cross-attention overlay PNG saved to
    ``{out_dir}/{study_id}/layer_{l}/{word_idx:04d}_{word}.png``.

    TPU-first difference: instead of capturing attention inside the per-token
    sampling loop, ONE teacher-forced decoder forward over the generated
    sequence recomputes all cross-attention maps batched (exact — the decoder
    is causal, so query t's attention is identical to the sampling step's).
    Returns the list of written files.
    """
    import os

    import jax.numpy as jnp

    from evoke_tpu.train.steps import maybe_normalize_images

    seqs = np.asarray(seqs)
    n = min(max_studies, seqs.shape[0])
    b = maybe_normalize_images({k: v for k, v in batch.items()
                                if not k.startswith("_")})
    # teacher-forced ids: [BOS, w0, w1, ...] — query position i predicts (and
    # therefore attends for) generated word i
    bos = np.full((seqs.shape[0], 1), tokenizer.bos_id, seqs.dtype)
    dec_ids = np.concatenate([bos, seqs[:, :-1]], axis=1)
    dec_mask = (np.concatenate([bos * 0 + 1, (seqs[:, :-1] != tokenizer.pad_id)],
                               axis=1)).astype(np.int32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    args = [b["images"], jnp.asarray(dec_ids), jnp.asarray(dec_mask),
            b["pids"], b["valid"]]
    if with_indication:
        args += [b["inc_ids"], b["inc_mask"]]
    _, inter = model.apply(variables, *args, train=False,
                           mutable=["intermediates"])
    dec_inter = inter["intermediates"]["text_decoder"]
    images = np.asarray(b["images"], np.float32)
    written: List[str] = []
    for layer_idx in range(num_layers):
        attn = extract_cross_attention(dec_inter, layer=f"dec_{layer_idx}")
        att = attn.mean(1)  # [B, Tq, P] head-mean, like the reference's .mean(0)
        for i in range(n):
            sid = str(study_ids[i]) if study_ids is not None else f"{i:04d}"
            d = os.path.join(out_dir, sid.replace(os.sep, "_"), f"layer_{layer_idx}")
            os.makedirs(d, exist_ok=True)
            for word_idx in range(seqs.shape[1]):
                tok_id = int(seqs[i, word_idx])
                if tok_id == tokenizer.pad_id or tok_id == tokenizer.eos_id:
                    break
                word = tokenizer.decode_batch([[tok_id]])[0].strip() or str(tok_id)
                path = os.path.join(d, f"{word_idx:04d}_{word[:40]}.png")
                save_png(token_heatmap(images[i], att[i, word_idx]), path)
                written.append(path)
    return written
