"""Host-side image loading + transforms (numpy/PIL — the data edge, never on device).

Capability parity: EVOKE's torchvision pipelines —
224 train: Resize(256) -> RandomCrop(224) -> RandomHorizontalFlip -> Normalize
(dataloaders_v0401.py:24-31); 224 eval: Resize((224,224));
384 train: Resize(448) -> RandomCrop(384) -> RandomRotation(5°)
(dataloaders_v0623.py:22-35); 384 eval: Resize(448) -> CenterCrop(384).
All normalized with ImageNet stats. Output is channels-last float32 [H, W, 3]
(XLA's preferred conv layout).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(path: str, image_dir: str = "") -> Image.Image | np.ndarray:
    full = os.path.join(image_dir, path) if image_dir else path
    if full.endswith(".npy"):
        return np.load(full)  # synthetic: already [H, W, 3] float32
    return Image.open(full).convert("RGB")


def _resize_short(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w < h:
        return img.resize((size, int(round(h * size / w))), Image.BILINEAR)
    return img.resize((int(round(w * size / h)), size), Image.BILINEAR)


def _to_float(img) -> np.ndarray:
    if isinstance(img, np.ndarray):
        return img.astype(np.float32)
    return np.asarray(img, np.float32) / 255.0


def _normalize(x: np.ndarray) -> np.ndarray:
    return (x - IMAGENET_MEAN) / IMAGENET_STD


@dataclass
class ImageTransform:
    """train/eval transform for a given resolution (224 or 384).

    output_uint8=True skips normalization and emits uint8 HWC — 4x less
    host->device transfer; pair with steps.normalize_images_on_device (the
    (x/255 - mean)/std runs on the chip instead).
    """

    image_size: int = 224
    train: bool = True
    output_uint8: bool = False

    def __call__(self, img, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        if isinstance(img, np.ndarray):
            # synthetic float arrays: resize via simple crop/pad, skip PIL
            x = img.astype(np.float32)
            x = _center_crop_or_pad(x, self.image_size)
            if self.output_uint8:
                x = np.clip((x * IMAGENET_STD + IMAGENET_MEAN) * 255.0, 0, 255)
                return x.astype(np.uint8)
            return x
        rng = rng or np.random.default_rng()
        s = self.image_size
        if self.train:
            if s == 224:
                img = _resize_short(img, 256)
                img = _random_crop(img, s, rng)
                if rng.random() < 0.5:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
            else:
                img = _resize_short(img, 448)
                angle = float(rng.uniform(-5.0, 5.0))
                img = img.rotate(angle, Image.BILINEAR)
                img = _random_crop(img, s, rng)
        else:
            if s == 224:
                img = img.resize((s, s), Image.BILINEAR)
            else:
                img = _resize_short(img, 448)
                img = _center_crop(img, s)
        if self.output_uint8:
            return np.asarray(img, np.uint8)
        return _normalize(_to_float(img))


def _random_crop(img: Image.Image, size: int, rng: np.random.Generator) -> Image.Image:
    w, h = img.size
    if w < size or h < size:
        img = img.resize((max(w, size), max(h, size)), Image.BILINEAR)
        w, h = img.size
    x = int(rng.integers(0, w - size + 1))
    y = int(rng.integers(0, h - size + 1))
    return img.crop((x, y, x + size, y + size))


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    x = (w - size) // 2
    y = (h - size) // 2
    return img.crop((x, y, x + size, y + size))


def _center_crop_or_pad(x: np.ndarray, size: int) -> np.ndarray:
    h, w = x.shape[:2]
    if h == size and w == size:
        return x
    out = np.zeros((size, size, x.shape[2]), np.float32)
    ch, cw = min(h, size), min(w, size)
    oy, ox = (size - ch) // 2, (size - cw) // 2
    sy, sx = (h - ch) // 2, (w - cw) // 2
    out[oy:oy + ch, ox:ox + cw] = x[sy:sy + ch, sx:sx + cw]
    return out


def make_transform(image_size: int, train: bool, output_uint8: bool = False
                   ) -> ImageTransform:
    return ImageTransform(image_size=image_size, train=train, output_uint8=output_uint8)
