"""Device-side frame preprocessing: (resize ->) rescale -> normalize.

TPU-native replacement for the host PIL loop of the "resize" aspect policy
(media/images.py:43-52; reference Vidi1.5_9B/vidi/dataset/img_utils.py:173-198
via SiglipImageProcessor): frames cross the host->device link as uint8 (4x
fewer bytes than float32 — the link, not the chip, dominates real-video
encode), and the rescale/normalize arithmetic runs on device where XLA fuses
it into the tower's first patch-embedding conv.

Two entry points:

- `normalize_uint8`: exact-parity normalize of already-resized uint8 frames.
  This is the default inference path (host PIL bicubic keeps bitwise parity
  with the reference processor; only the float math moves on device).
- `resize_bicubic`: antialiased Keys-cubic resize on device
  (`jax.image.resize(method="cubic")`, same a=-0.5 kernel family as PIL
  bicubic; agrees within ~1/255 per channel). With it the raw decoded frames
  ship directly and the host does no per-frame python at all — the right
  trade when the host link is wide (local PCIe) or host CPU is the
  bottleneck at scale.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Stats = Union[float, Sequence[float]]


def normalize_uint8(x: jnp.ndarray, mean: Stats, std: Stats,
                    dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [..., 3] -> ((x/255) - mean)/std, same op order as the host
    `media.images.normalize_pixels` (float32 arithmetic, then cast)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    out = (x.astype(jnp.float32) / 255.0 - mean) / std
    return out.astype(dtype)


def resize_bicubic(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[N, H, W, 3] float -> [N, size, size, 3] antialiased bicubic resize
    (device-side analog of PIL `Image.BICUBIC`)."""
    n, _, _, c = x.shape
    out = jax.image.resize(x.astype(jnp.float32), (n, size, size, c),
                           method="cubic", antialias=True)
    # PIL resamples in the uint8 domain and saturates; Keys-cubic overshoot
    # at hard edges would otherwise leave values outside [0, 255]
    return jnp.clip(out, 0.0, 255.0)


def preprocess_uint8(x: jnp.ndarray, size: int, mean: Stats, std: Stats,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Full device-side "resize" policy: uint8 [N, H, W, 3] at any decode
    resolution -> normalized [N, size, size, 3]. Resize happens in fp32
    *before* normalization, matching PIL's uint8-domain resample ordering
    closely (resize commutes with the affine normalize up to rounding)."""
    if x.shape[1] != size or x.shape[2] != size:
        x = resize_bicubic(x, size)
    return normalize_uint8(x, mean, std, dtype)
