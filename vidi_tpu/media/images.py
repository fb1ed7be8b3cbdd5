"""Image / frame preprocessing (host side).

Replaces SiglipImageProcessor + the reference's aspect policies
(reference: Vidi1.5_9B/vidi/dataset/img_utils.py:173-198). The "resize"
policy — the one used for video (finetune.sh:20, dataset/video.py:71) — is
PIL bicubic resize to (S, S), rescale 1/255, normalize mean=std=0.5.

Output layout is NHWC float32 (our towers are NHWC; the reference is NCHW).
"""
from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np
from PIL import Image

SIGLIP_MEAN = 0.5
SIGLIP_STD = 0.5


def _to_pil(frame) -> Image.Image:
    if isinstance(frame, Image.Image):
        return frame
    return Image.fromarray(np.asarray(frame)).convert("RGB")


def normalize_pixels(arr: np.ndarray, mean: float = SIGLIP_MEAN,
                     std: float = SIGLIP_STD) -> np.ndarray:
    return ((arr.astype(np.float32) / 255.0) - mean) / std


def preprocess_frames_resize(
    frames: Sequence, output_size: int = 384,
) -> np.ndarray:
    """"resize" aspect policy -> [N, S, S, 3] float32."""
    out = np.empty((len(frames), output_size, output_size, 3), np.float32)
    for i, f in enumerate(frames):
        img = _to_pil(f).resize((output_size, output_size), resample=Image.BICUBIC)
        out[i] = normalize_pixels(np.asarray(img))
    return out


def expand2square(img: Image.Image, fill: Tuple[int, int, int]) -> Image.Image:
    """Pad to square with the mean color (img_utils.py:159-171)."""
    w, h = img.size
    if w == h:
        return img
    side = max(w, h)
    out = Image.new(img.mode, (side, side), fill)
    out.paste(img, ((side - w) // 2, (side - h) // 2))
    return out


def preprocess_frames_pad(frames: Sequence, output_size: int = 384) -> np.ndarray:
    fill = tuple(int(SIGLIP_MEAN * 255) for _ in range(3))
    padded = [expand2square(_to_pil(f), fill) for f in frames]
    return preprocess_frames_resize(padded, output_size)


# ---------------------------------------------------------------------------
# anyres (image mode) — grid selection (img_utils.py:16-43,103-120)
# ---------------------------------------------------------------------------

def select_best_resolution(original_size: Tuple[int, int],
                           possible: Iterable[Tuple[int, int]]) -> Tuple[int, int]:
    ow, oh = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for w, h in possible:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (w, h), eff, waste
    return best


def get_anyres_grid_shape(image_size: Tuple[int, int],
                          grid_res: Sequence[Tuple[int, int]],
                          patch_px: int) -> Tuple[int, int]:
    w, h = select_best_resolution(image_size, grid_res)
    return w // patch_px, h // patch_px


def resize_and_pad(img: Image.Image, target: Tuple[int, int]) -> Image.Image:
    """Aspect-preserving resize then center-pad (img_utils.py:45-77)."""
    import math
    ow, oh = img.size
    tw, th = target
    sw, sh = tw / ow, th / oh
    if sw < sh:
        nw, nh = tw, min(math.ceil(oh * sw), th)
    else:
        nh, nw = th, min(math.ceil(ow * sh), tw)
    resized = img.resize((nw, nh), resample=Image.BICUBIC)
    out = Image.new("RGB", (tw, th), (0, 0, 0))
    out.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return out


def divide_to_patches(img: Image.Image, patch_px: int) -> List[Image.Image]:
    patches = []
    w, h = img.size
    for top in range(0, h, patch_px):
        for left in range(0, w, patch_px):
            patches.append(img.crop((left, top, left + patch_px, top + patch_px)))
    return patches


def process_anyres_image(img: Image.Image, output_size: int,
                         grid_res: Sequence[Tuple[int, int]]) -> np.ndarray:
    """-> [1 + n_patches, S, S, 3]: global resize view + grid crops."""
    best = select_best_resolution(img.size, grid_res)
    padded = resize_and_pad(img, best)
    patches = divide_to_patches(padded, output_size)
    base = img.resize((output_size, output_size), resample=Image.BICUBIC)
    return preprocess_frames_resize([base] + patches, output_size)
