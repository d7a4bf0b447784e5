"""Host-side preprocessing (PIL, exact parity with the reference).

The stage-2 classifier is sensitive to the 336px bicubic resample, so the
host keeps PIL semantics exactly (`/root/reference/alpha_clip_rw/alpha_clip.py:79-94`,
`/root/reference/datasets/wrappers.py:22-35`):

  * SAM input: Resize((1024,1024), bilinear) -> /255 -> ImageNet norm;
  * GT mask:   Resize((1024,1024), NEAREST)  -> /255;
  * CLIP input: Resize(shorter side -> 336, bicubic) -> CenterCrop(336)
                -> /255 -> OpenAI CLIP norm;
  * CLIP alpha (stage 1): all-ones mask through Normalize(0.5, 0.26),
    i.e. the constant (1-0.5)/0.26.

Outputs are NHWC float32 numpy arrays, ready for device_put.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

CLIP_ALPHA_MEAN = 0.5
CLIP_ALPHA_STD = 0.26
ONES_ALPHA_VALUE = (1.0 - CLIP_ALPHA_MEAN) / CLIP_ALPHA_STD  # ≈ 1.9231


def _to_float_array(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def sam_image_transform(img: Image.Image, size: int = 1024) -> np.ndarray:
    """(H, W, 3) fp32, ImageNet-normalised, resized to (size, size)."""
    img = img.convert("RGB").resize((size, size), Image.BILINEAR)
    arr = _to_float_array(img)
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def mask_to_target(mask: Image.Image, size: int = 1024) -> np.ndarray:
    """(H, W, 1) fp32 in [0,1]: nearest resize then /255 (reference ValDataset)."""
    mask = mask.convert("L").resize((size, size), Image.NEAREST)
    return _to_float_array(mask)


def _resize_shorter_side(img: Image.Image, n_px: int, resample) -> Image.Image:
    # torchvision F.resize(int size): new_long = int(size * long / short) —
    # TRUNCATED, not rounded (the reference's CLIP preprocessing,
    # alpha_clip_rw/alpha_clip.py:79-85, is torchvision Resize+CenterCrop;
    # a round() here shifted the resample grid 1 px for ~half of
    # non-integer aspect ratios)
    w, h = img.size
    if w <= h:
        new_w, new_h = n_px, max(1, int(h * n_px / w))
    else:
        new_w, new_h = max(1, int(w * n_px / h)), n_px
    return img.resize((new_w, new_h), resample)


def _center_crop(arr: np.ndarray, n_px: int) -> np.ndarray:
    # torchvision F.center_crop: offset = int(round(diff / 2.0)) — Python
    # banker's rounding (diff 11 -> 6, diff 13 -> 6), not floor
    h, w = arr.shape[:2]
    top = max(0, int(round((h - n_px) / 2.0)))
    left = max(0, int(round((w - n_px) / 2.0)))
    return arr[top : top + n_px, left : left + n_px]


def clip_image_transform(img: Image.Image, n_px: int = 336) -> np.ndarray:
    """(n_px, n_px, 3) fp32, OpenAI-CLIP normalised (bicubic + center crop)."""
    img = _resize_shorter_side(img, n_px, Image.BICUBIC).convert("RGB")
    arr = _center_crop(_to_float_array(img), n_px)
    return (arr - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD


def clip_ones_alpha(n_px: int = 336) -> np.ndarray:
    """(n_px, n_px, 1) constant all-ones alpha after Normalize(0.5, 0.26)."""
    return np.full((n_px, n_px, 1), ONES_ALPHA_VALUE, np.float32)


def clip_alpha_transform(mask: Image.Image, n_px: int = 336) -> np.ndarray:
    """(n_px, n_px, 1) fp32 alpha from a real mask: bicubic shorter-side
    resize -> center crop -> /255 -> Normalize(0.5, 0.26) — the reference's
    `mask_transform` (`/root/reference/alpha_clip_rw/alpha_clip.py:88-94`),
    used when Alpha-CLIP is conditioned on a ground-truth mask (MaPLe prompt
    training) rather than the all-ones stage-1 alpha."""
    mask = _resize_shorter_side(mask.convert("L"), n_px, Image.BICUBIC)
    arr = _center_crop(_to_float_array(mask), n_px)
    return (arr - CLIP_ALPHA_MEAN) / CLIP_ALPHA_STD


def sam_image_resized_u8(img: Image.Image, size: int = 1024) -> np.ndarray:
    """(size, size, 3) uint8 — the resize half of `sam_image_transform`.

    The /255 + ImageNet normalisation runs IN-GRAPH on device (fp32, same op
    order -> same values): shipping uint8 quarters host->device traffic,
    which dominates the eval loop on bandwidth-limited links (the tunneled
    dev TPU moves ~110 MB/batch of fp32 at ~15 MB/s)."""
    return np.asarray(img.convert("RGB").resize((size, size), Image.BILINEAR))


def clip_image_resized_u8(img: Image.Image, n_px: int = 336) -> np.ndarray:
    """(n_px, n_px, 3) uint8 — resize+crop half of `clip_image_transform`
    (bicubic shorter side + center crop; normalisation runs in-graph)."""
    img = _resize_shorter_side(img, n_px, Image.BICUBIC).convert("RGB")
    return _center_crop(np.asarray(img), n_px)


def maybe_rot90_to_match(img: Image.Image, mask: Image.Image) -> Image.Image:
    """The reference rotates size-mismatched images 90° CCW
    (`/root/reference/datasets/wrappers.py:56-59`)."""
    if img.size != mask.size:
        return Image.fromarray(np.rot90(np.asarray(img)))
    return img
