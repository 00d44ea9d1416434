"""Image transforms, split host/device TPU-first.

The reference preprocesses on CPU per sample with torchvision
(/root/reference/data/dataset_aug.py:19-52): NEAREST resize + crop +
ToTensor + ImageNet normalize, and a photometric branch (ColorJitter,
RandomGrayscale, GaussianBlur).

Here the split is:
  * HOST (PIL/numpy, this module's *_np functions): decode, NEAREST
    shorter-side resize, center/random/five crop -> fixed-shape uint8.
  * DEVICE (jnp, jit-able): /255 + normalize (``normalize_images``) and
    the batched photometric augmentation (``photometric_aug``) — fused
    into the training step, so the host->device transfer is uint8 (4x
    smaller than f32) and the augs are vectorized over the whole batch
    instead of per-sample Python.

Parity notes: resize/crop match PIL/torchvision exactly (tested);
photometric augs are distribution-equivalent (explicit JAX PRNG; jitter
ops applied in fixed order vs torchvision's random order).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# host side (PIL parity)
# ---------------------------------------------------------------------------

def resize_shorter_np(img: Image.Image, res, nearest: bool = True) -> Image.Image:
    """torchvision T.Resize(res, NEAREST): int res scales the shorter side;
    (h, w) res resizes exactly."""
    if isinstance(res, (tuple, list)):
        out_h, out_w = res
    else:
        w, h = img.size
        if w <= h:
            out_w = res
            out_h = max(int(round(res * h / w)), 1)
        else:
            out_h = res
            out_w = max(int(round(res * w / h)), 1)
    resample = Image.NEAREST if nearest else Image.BILINEAR
    return img.resize((out_w, out_h), resample)


def center_crop_np(arr: np.ndarray, size: int) -> np.ndarray:
    """torchvision CenterCrop on an HW[C] array (pads if smaller)."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        pad_h, pad_w = max(size - h, 0), max(size - w, 0)
        pads = [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)]
        if arr.ndim == 3:
            pads.append((0, 0))
        arr = np.pad(arr, pads)
        h, w = arr.shape[:2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return arr[top: top + size, left: left + size]


def random_crop_np(arr: np.ndarray, size: int, rng: np.random.RandomState) -> np.ndarray:
    h, w = arr.shape[:2]
    top = rng.randint(0, max(h - size, 0) + 1)
    left = rng.randint(0, max(w - size, 0) + 1)
    return arr[top: top + size, left: left + size]


def load_image(path: str, res: int, crop_type: str = "center",
               rng: Optional[np.random.RandomState] = None,
               crop_coords: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Decode + NEAREST resize + crop -> (res, res, 3) uint8."""
    img = Image.open(path).convert("RGB")
    return prepare_image(img, res, crop_type, rng, crop_coords)


def prepare_image(img: Image.Image, res: int, crop_type: str = "center",
                  rng: Optional[np.random.RandomState] = None,
                  crop_coords: Optional[Tuple[int, int]] = None) -> np.ndarray:
    if crop_type in (None, "none"):
        img = resize_shorter_np(img, (res, res))
        return np.asarray(img, np.uint8)
    img = resize_shorter_np(img, res)
    arr = np.asarray(img, np.uint8)
    if crop_type == "center":
        return center_crop_np(arr, res)
    if crop_type == "random":
        if crop_coords is not None:
            top, left = crop_coords
            return arr[top: top + res, left: left + res]
        return random_crop_np(arr, res, rng or np.random)
    raise ValueError(f"Unknown Cropper {crop_type}")


def load_label(path_or_img, res: int, crop_type: str = "center",
               rng: Optional[np.random.RandomState] = None,
               crop_coords: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Decode + NEAREST resize + crop for labels -> (res, res) int32."""
    img = path_or_img if isinstance(path_or_img, Image.Image) \
        else Image.open(path_or_img)
    if crop_type in (None, "none"):
        img = resize_shorter_np(img, (res, res))
        return np.asarray(img, np.int32)
    img = resize_shorter_np(img, res)
    arr = np.asarray(img, np.int32)
    if crop_type == "center":
        return center_crop_np(arr, res)
    if crop_type == "random":
        if crop_coords is not None:
            top, left = crop_coords
            return arr[top: top + res, left: left + res]
        return random_crop_np(arr, res, rng or np.random)
    raise ValueError(f"Unknown Cropper {crop_type}")


def five_crop_np(arr: np.ndarray, crop_h: int, crop_w: int):
    """torchvision five_crop: tl, tr, bl, br, center (crop_dataset.py:84-85)."""
    h, w = arr.shape[:2]
    tl = arr[:crop_h, :crop_w]
    tr = arr[:crop_h, w - crop_w:]
    bl = arr[h - crop_h:, :crop_w]
    br = arr[h - crop_h:, w - crop_w:]
    center = center_crop_np(arr, crop_h) if crop_h == crop_w else \
        arr[(h - crop_h) // 2:(h - crop_h) // 2 + crop_h,
            (w - crop_w) // 2:(w - crop_w) // 2 + crop_w]
    return [tl, tr, bl, br, center]


def random_crops_np(arr: np.ndarray, crop_h: int, crop_w: int, seed: int, n: int = 5):
    """Seeded crops (crop_dataset.py:21-63): deterministic per (seed, i)."""
    h, w = arr.shape[:2]
    out = []
    for i in range(n):
        rs = np.random.RandomState(abs(hash((seed, i))) % (2**31))
        top = rs.randint(0, h - crop_h)
        left = rs.randint(0, w - crop_w)
        out.append(arr[top: top + crop_h, left: left + crop_w])
    return out


# ---------------------------------------------------------------------------
# device side (jit-able, batched)
# ---------------------------------------------------------------------------

def normalize_images(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 (b, h, w, 3) -> normalized float32 (ToTensor + Normalize,
    dataset_aug.py:43-44).  Also accepts already-float [0,1] input."""
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (img - mean) / std


def unnormalize_images(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse of normalize (crf_utils.py:17-29 UnNormalize)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return img * std + mean


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114])
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _rgb_to_hsv(img: jnp.ndarray):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    dz = jnp.maximum(deltac, 1e-12)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(deltac == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    conds = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    r = jnp.select([i == k for k in range(6)], [c[0] for c in conds])
    g = jnp.select([i == k for k in range(6)], [c[1] for c in conds])
    b = jnp.select([i == k for k in range(6)], [c[2] for c in conds])
    return jnp.stack([r, g, b], axis=-1)


def photometric_aug(
    key: jax.Array,
    img: jnp.ndarray,           # (b, h, w, 3) in [0, 1]
    *,
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.1,
    grayscale_p: float = 0.2,
    blur_p: float = 0.5,
    blur_kernel: int = 3,
    blur_sigma: Tuple[float, float] = (3.0, 3.0),
) -> jnp.ndarray:
    """Batched ColorJitter + RandomGrayscale + GaussianBlur
    (dataset_aug.py:40-42), one independent draw per image."""
    b = img.shape[0]
    keys = jax.random.split(key, 7)

    # brightness: blend toward zero
    fb = jax.random.uniform(keys[0], (b, 1, 1, 1),
                            minval=1 - brightness, maxval=1 + brightness)
    img = jnp.clip(img * fb, 0.0, 1.0)
    # contrast: blend with mean gray
    fc = jax.random.uniform(keys[1], (b, 1, 1, 1),
                            minval=1 - contrast, maxval=1 + contrast)
    mean_gray = jnp.mean(_rgb_to_gray(img), axis=(1, 2), keepdims=True)
    img = jnp.clip(fc * img + (1 - fc) * mean_gray, 0.0, 1.0)
    # saturation: blend with per-pixel gray
    fs = jax.random.uniform(keys[2], (b, 1, 1, 1),
                            minval=1 - saturation, maxval=1 + saturation)
    img = jnp.clip(fs * img + (1 - fs) * _rgb_to_gray(img), 0.0, 1.0)
    # hue shift in HSV
    fh = jax.random.uniform(keys[3], (b, 1, 1), minval=-hue, maxval=hue)
    h, s, v = _rgb_to_hsv(img)
    img = jnp.clip(_hsv_to_rgb((h + fh) % 1.0, s, v), 0.0, 1.0)
    # random grayscale
    to_gray = jax.random.bernoulli(keys[4], grayscale_p, (b, 1, 1, 1))
    img = jnp.where(to_gray, jnp.broadcast_to(_rgb_to_gray(img), img.shape), img)
    # gaussian blur (separable depthwise conv); sigma drawn PER IMAGE,
    # matching torchvision GaussianBlur's per-call sample
    # (dataset_aug.py:42 applies the transform independently per item)
    sig = jax.random.uniform(keys[5], (b,), minval=blur_sigma[0],
                             maxval=blur_sigma[1])
    half = blur_kernel // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k1d = jnp.exp(-0.5 * (x[None, :] / jnp.maximum(sig[:, None], 1e-6)) ** 2)
    k1d = k1d / jnp.sum(k1d, axis=-1, keepdims=True)        # (b, kernel)

    def blur(im):
        im_p = jnp.pad(im, [(0, 0), (half, half), (0, 0), (0, 0)], mode="edge")
        taps = jnp.stack(
            [im_p[:, i:i + im.shape[1]] for i in range(blur_kernel)], axis=1)
        im_h = jnp.einsum("bk,bkhwc->bhwc", k1d, taps)
        im_p = jnp.pad(im_h, [(0, 0), (0, 0), (half, half), (0, 0)], mode="edge")
        taps = jnp.stack(
            [im_p[:, :, i:i + im.shape[2]] for i in range(blur_kernel)], axis=2)
        return jnp.einsum("bk,bhkwc->bhwc", k1d, taps)

    do_blur = jax.random.bernoulli(keys[6], blur_p, (b, 1, 1, 1))
    img = jnp.where(do_blur, blur(img), img)
    return img
