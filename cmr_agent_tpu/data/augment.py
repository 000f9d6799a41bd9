"""Image resize + color-jitter augmentation.

Replaces the reference's cv2.resize (dataset/KittiDataset.py:290-293) and
torchvision ColorJitter (dataset/KittiDataset.py:209-218) with
cv2-when-available / PIL fallbacks, driven by an explicit numpy RNG so the
whole pipeline is reproducible.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image, ImageEnhance


def resize_image(img: np.ndarray, scale: float) -> np.ndarray:
    """Bilinear resize by ``scale`` (uint8 or float HWC)."""
    h = int(round(img.shape[0] * scale))
    w = int(round(img.shape[1] * scale))
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    pil = Image.fromarray(img.astype(np.uint8))
    return np.asarray(pil.resize((w, h), Image.BILINEAR))


def color_jitter(rng: np.random.Generator, img: np.ndarray,
                 brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                 saturation=(0.8, 1.2), hue=(-0.1, 0.1)) -> np.ndarray:
    """Brightness/contrast/saturation/hue jitter in random order.

    Matches torchvision ColorJitter semantics (uniform factors, random
    application order) on uint8 HWC images.
    """
    img_pil = Image.fromarray(img.astype(np.uint8))
    ops = list(rng.permutation(4))
    for op in ops:
        if op == 0:
            f = rng.uniform(*brightness)
            img_pil = ImageEnhance.Brightness(img_pil).enhance(f)
        elif op == 1:
            f = rng.uniform(*contrast)
            img_pil = ImageEnhance.Contrast(img_pil).enhance(f)
        elif op == 2:
            f = rng.uniform(*saturation)
            img_pil = ImageEnhance.Color(img_pil).enhance(f)
        else:
            f = rng.uniform(*hue)
            hsv = np.array(img_pil.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(f * 255)) % 256
            img_pil = Image.fromarray(hsv.astype(np.uint8),
                                      "HSV").convert("RGB")
    return np.asarray(img_pil)
