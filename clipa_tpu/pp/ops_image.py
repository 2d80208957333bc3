"""Image preprocessing ops (host side, TF-free).

Covers the reference op set (clipa_jax/transforms/ops_image.py): decode,
resize, resize_small, central_crop, random_crop, inception_crop,
decode_jpeg_and_inception_crop (fused partial decode), flip_lr, value_range,
vgg_value_range.

Backend: PIL for JPEG decode/resize. `decode_jpeg_and_inception_crop`
exploits libjpeg draft-mode DCT scaling — for CLIPA's reduced-resolution
pretraining (84px targets from ~500px JPEGs) most of the decode work is
skipped, which is the same win the reference gets from TF's fused
`decode_and_crop_jpeg` (ops_image.py:167-219). A C++ decode pool (libjpeg)
in clipa_tpu/native accelerates the same ops when built.

Images flow as HWC uint8 numpy arrays and stay uint8 until the device
(normalization fuses into the model stem; see clipa_tpu/ops/preprocess.py).
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

from clipa_tpu.registry import InKeyOutKey, Registry

_default_rng = np.random.default_rng(0)

_PIL_METHODS = {}


def _pil():
    global _PIL_METHODS
    from PIL import Image
    if not _PIL_METHODS:
        _PIL_METHODS = {
            "bilinear": Image.Resampling.BILINEAR,
            "bicubic": Image.Resampling.BICUBIC,
            "nearest": Image.Resampling.NEAREST,
            "lanczos": Image.Resampling.LANCZOS,
            "area": Image.Resampling.BOX,
        }
    return Image


def _rng_of(sample) -> np.random.Generator:
    return sample.get("_rng", _default_rng) if isinstance(sample, dict) \
        else _default_rng


def _native_lib():
    """The C++ decode library, or None (PIL fallback)."""
    try:
        from clipa_tpu import native
        return native.load() if native.available() else None
    except Exception:
        return None


def _native_decode_crop(lib, data: bytes, rng, size: int, area_min, area_max):
    """Fused libjpeg decode+crop+resize; None on failure (PIL fallback)."""
    import ctypes
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_info(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    top, left, ch, cw = _sample_inception_box(rng, h.value, w.value,
                                              area_min, area_max)
    out = np.empty((size, size, 3), np.uint8)
    ret = lib.jpeg_decode_crop_resize(
        data, len(data), top, left, ch, cw, size, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if ret == 0 else None


def _to_pil(x):
    Image = _pil()
    if isinstance(x, Image.Image):
        return x
    arr = np.asarray(x)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return Image.fromarray(arr)


def _resize_np(img: np.ndarray, h: int, w: int, method: str) -> np.ndarray:
    pil = _to_pil(img).resize((w, h), _PIL_METHODS[method])
    return np.asarray(pil)


@Registry.register("preprocess_ops.decode")
@InKeyOutKey(indefault="image", outdefault="image")
def get_decode(channels: int = 3):
    Image = _pil()

    def _op(data):
        if isinstance(data, np.ndarray) and data.ndim == 3:
            return data  # already decoded
        img = Image.open(io.BytesIO(bytes(data)))
        img = img.convert("RGB" if channels == 3 else "L")
        return np.asarray(img)

    return _op


@Registry.register("preprocess_ops.resize")
@InKeyOutKey(indefault="image", outdefault="image")
def get_resize(size, method: str = "bilinear", antialias: bool = True):
    del antialias  # PIL resampling filters are inherently antialiased
    h, w = (size, size) if isinstance(size, int) else size

    def _op(image):
        return _resize_np(image, h, w, method)

    return _op


@Registry.register("preprocess_ops.resize_small")
@InKeyOutKey(indefault="image", outdefault="image")
def get_resize_small(smaller_size: int, method: str = "bilinear",
                     antialias: bool = True):
    """Resizes so the shorter side equals smaller_size (aspect preserved)."""
    del antialias

    def _op(image):
        ih, iw = np.asarray(image).shape[:2]
        ratio = smaller_size / min(ih, iw)
        h, w = round(ih * ratio), round(iw * ratio)
        return _resize_np(image, h, w, method)

    return _op


@Registry.register("preprocess_ops.central_crop")
@InKeyOutKey(indefault="image", outdefault="image")
def get_central_crop(crop_size):
    h, w = (crop_size, crop_size) if isinstance(crop_size, int) else crop_size

    def _op(image):
        image = np.asarray(image)
        ih, iw = image.shape[:2]
        top, left = (ih - h) // 2, (iw - w) // 2
        return image[top:top + h, left:left + w]

    return _op


@Registry.register("preprocess_ops.random_crop")
@InKeyOutKey(indefault="image", outdefault="image", with_data=True)
def get_random_crop(crop_size):
    h, w = (crop_size, crop_size) if isinstance(crop_size, int) else crop_size

    def _op(image, sample=None):
        rng = _rng_of(sample)
        image = np.asarray(image)
        ih, iw = image.shape[:2]
        top = int(rng.integers(0, ih - h + 1))
        left = int(rng.integers(0, iw - w + 1))
        return image[top:top + h, left:left + w]

    return _op


def _sample_inception_box(rng, ih: int, iw: int, area_min: float,
                          area_max: float, max_attempts: int = 10,
                          ratio_min: float = 3 / 4, ratio_max: float = 4 / 3):
    """Samples an aspect/area-jittered crop box (Szegedy et al. style)."""
    area = ih * iw
    for _ in range(max_attempts):
        target_area = rng.uniform(area_min / 100, area_max / 100) * area
        aspect = np.exp(rng.uniform(np.log(ratio_min), np.log(ratio_max)))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if cw <= iw and ch <= ih:
            top = int(rng.integers(0, ih - ch + 1))
            left = int(rng.integers(0, iw - cw + 1))
            return top, left, ch, cw
    # fallback: central square
    s = min(ih, iw)
    return (ih - s) // 2, (iw - s) // 2, s, s


@Registry.register("preprocess_ops.inception_crop")
@InKeyOutKey(indefault="image", outdefault="image", with_data=True)
def get_inception_crop(size: Optional[int] = None, area_min: int = 5,
                       area_max: int = 100, method: str = "bilinear",
                       antialias: bool = True):
    del antialias

    def _op(image, sample=None):
        rng = _rng_of(sample)
        image = np.asarray(image)
        ih, iw = image.shape[:2]
        top, left, ch, cw = _sample_inception_box(rng, ih, iw, area_min,
                                                  area_max)
        crop = image[top:top + ch, left:left + cw]
        if size is not None:
            crop = _resize_np(crop, size, size, method)
        return crop

    return _op


@Registry.register("preprocess_ops.decode_jpeg_and_inception_crop")
@InKeyOutKey(indefault="image", outdefault="image", with_data=True)
def get_decode_jpeg_and_inception_crop(size: Optional[int] = None,
                                       area_min: int = 5, area_max: int = 100,
                                       method: str = "bilinear",
                                       antialias: bool = True):
    """Fused decode+crop: crop box from the header, draft-scaled decode.

    libjpeg can decode at 1/2, 1/4, 1/8 DCT scale nearly for free; when the
    final target is small (CLIPA pretrains at 64-112px) this skips most of
    the inverse DCT + color conversion work — the host-side analogue of the
    reference's tf.image.decode_and_crop_jpeg fusion (ops_image.py:167-219).
    """
    del antialias
    Image = _pil()
    native_lib = _native_lib() if size is not None else None

    def _op(data, sample=None):
        rng = _rng_of(sample)
        if isinstance(data, np.ndarray) and data.ndim == 3:
            # Already decoded; degrade to plain inception crop.
            ih, iw = data.shape[:2]
            top, left, ch, cw = _sample_inception_box(rng, ih, iw, area_min,
                                                      area_max)
            crop = data[top:top + ch, left:left + cw]
            return _resize_np(crop, size, size, method) if size else crop

        if native_lib is not None:
            out = _native_decode_crop(native_lib, bytes(data), rng, size,
                                      area_min, area_max)
            if out is not None:
                return out

        img = Image.open(io.BytesIO(bytes(data)))  # header only (lazy)
        iw, ih = img.size
        top, left, ch, cw = _sample_inception_box(rng, ih, iw, area_min,
                                                  area_max)
        if size is not None and ch >= 2 * size and cw >= 2 * size:
            # Ask libjpeg for the smallest DCT scale that still oversamples
            # the target; draft() mutates the decoder before full decode.
            img.draft("RGB", (max(1, iw * size // cw),
                              max(1, ih * size // ch)))
            sx = img.size[0] / iw
            sy = img.size[1] / ih
            top, left = int(top * sy), int(left * sx)
            ch, cw = max(1, int(ch * sy)), max(1, int(cw * sx))
        img = img.convert("RGB")
        crop = img.crop((left, top, left + cw, top + ch))
        if size is not None:
            crop = crop.resize((size, size), _PIL_METHODS[method])
        return np.asarray(crop)

    return _op


@Registry.register("preprocess_ops.flip_lr")
@InKeyOutKey(indefault="image", outdefault="image", with_data=True)
def get_flip_lr():
    def _op(image, sample=None):
        rng = _rng_of(sample)
        image = np.asarray(image)
        return image[:, ::-1] if rng.random() < 0.5 else image

    return _op


@Registry.register("preprocess_ops.value_range")
@InKeyOutKey(indefault="image", outdefault="image")
def get_value_range(vmin: float = -1.0, vmax: float = 1.0,
                    in_min: float = 0.0, in_max: float = 255.0,
                    clip_values: bool = False):
    def _op(image):
        image = np.asarray(image, np.float32)
        image = (image - in_min) / (in_max - in_min)
        image = vmin + image * (vmax - vmin)
        if clip_values:
            image = np.clip(image, vmin, vmax)
        return image

    return _op


# ImageNet channel stats in the 0..255 domain (the reference's
# "vgg_value_range", ops_image.py:338-361 — CLIPA's training value range).
VGG_MEAN = (0.485 * 255, 0.456 * 255, 0.406 * 255)
VGG_STD = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def _mean_std_op(mean, std):
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    def _op(image):
        return (np.asarray(image, np.float32) - mean) / std

    return _op


@Registry.register("preprocess_ops.vgg_value_range")
@InKeyOutKey(indefault="image", outdefault="image")
def get_vgg_value_range(mean=VGG_MEAN, std=VGG_STD):
    return _mean_std_op(mean, std)


# OpenAI CLIP channel stats (0..255 domain) — the default normalization of
# the reference's open_clip eval transform (clipa_torch/open_clip/
# constants.py + transform.py), used by non-BigVision model configs.
OPENAI_MEAN = (0.48145466 * 255, 0.4578275 * 255, 0.40821073 * 255)
OPENAI_STD = (0.26862954 * 255, 0.26130258 * 255, 0.27577711 * 255)


@Registry.register("preprocess_ops.openai_value_range")
@InKeyOutKey(indefault="image", outdefault="image")
def get_openai_value_range(mean=OPENAI_MEAN, std=OPENAI_STD):
    return _mean_std_op(mean, std)
