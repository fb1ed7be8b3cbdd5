"""Jitted training step for the Dattn LMM.

Batch layout (dense, mask-based — the TPU form of the reference's ragged
lists, dataset/collator.py:12-74):
  input_ids   [B, T]   — <image> token already spliced out host-side
  labels      [B, T]   — IGNORE_INDEX-masked
  text_mask   [B, T]   bool
  images      [B, N, S, S, 3]
  frame_counts[B]
  mels        [B, W, n_mels, 3000]
  audio_sizes [B]

GSPMD handles DP/FSDP/SP from the shardings in parallel/sharding.py; remat
(jax.checkpoint) replaces the reference's gradient checkpointing.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vidi_tpu.core.config import DattnConfig
from vidi_tpu.models import dattn, decoder
from vidi_tpu.models.adapters import budget_hw
from vidi_tpu.parallel.sharding import constrain
from vidi_tpu.train.losses import shifted_cross_entropy


def loss_fn(params, cfg: DattnConfig, batch: Dict, rng, *,
            hw: Tuple[int, int], mm_chunks: int = 1, remat=True,
            use_flash: bool = False, sp_mode: str = "gspmd",
            frozen: Tuple[str, ...] = (), grid_shape=None):
    # Frozen modules (top-level subtrees: "vision"/"audio"/"text"/"mm") get
    # stop_gradient so XLA drops their backward entirely — the reference runs
    # frozen towers under set_grad_enabled(False) (multimodal.py:159-169);
    # without this the tower backward is computed and then zeroed by the
    # optimizer's set_to_zero label, ~2x the tower FLOPs wasted per step.
    if frozen:
        params = {k: (jax.tree.map(jax.lax.stop_gradient, v)
                      if k in frozen else v)
                  for k, v in params.items()}
    rngs = jax.random.split(rng, 3)
    if "frame_counts" in batch:
        # use_flash reaches the towers too: the single-block tower_attention
        # kernel is 3-4x XLA here and its custom VJP recomputes with exact
        # jnp math, so it is safe whether or not the towers are frozen
        img, img_mask = dattn.encode_video_images(
            params, cfg, batch["images"], batch["frame_counts"], hw,
            mm_chunks=mm_chunks, pos_rng=rngs[0], use_flash=use_flash)
        aud, aud_mask = dattn.encode_video_audios(
            params, cfg, batch["mels"], batch["audio_sizes"],
            mm_chunks=mm_chunks, pos_rng=rngs[1], use_flash=use_flash)
    else:
        # image-conversation batches (mm_input_type="image", collate_images):
        # one image per sample through the image adapter path, no audio
        # (reference dataset_type="image-conv", multimodal.py:267-337).
        # Anyres: batch["grids"] carries per-sample (gw, gh) tile grids as a
        # traced array (mixed grids per batch, one compile per tile-count
        # bucket); `grid_shape` (static) is the batch-1 single-grid form.
        img, img_mask = dattn.encode_images(
            params, cfg, batch["images"], mm_chunks=mm_chunks,
            pos_rng=rngs[0], grid_shape=grid_shape,
            grids=batch.get("grids"))
        aud = aud_mask = None

    ids = constrain(batch["input_ids"], "data", None)
    mask = batch["text_mask"]
    # packed batches (train/packing.py) carry explicit per-segment positions
    # and segment ids; unpacked batches derive positions from the mask
    positions = batch.get("positions")
    if positions is None:
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0).astype(jnp.int32)
    embeds = decoder.embed_tokens(params["text"], ids, cfg.text)

    h, _ = dattn.forward(
        params, cfg, embeds, mask, positions,
        img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
        mm_chunks=mm_chunks, remat=remat, use_flash=use_flash,
        sp_mode=sp_mode, text_segs=batch.get("segment_ids"))
    logits = decoder.lm_logits(params["text"], h, cfg.text)
    return shifted_cross_entropy(logits, batch["labels"], cfg.loss_thres)


def opt_init(tx, params):
    """Initialize optimizer state in fp32 (the reference accumulates grads in
    fp32 under ZeRO-3, zero3.json "grad_accum_dtype": fp32)."""
    return tx.init(jax.tree.map(lambda p: p.astype(jnp.float32), params))


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "hw", "mm_chunks", "remat", "use_flash", "sp_mode", "frozen", "grid_shape"),
                   donate_argnames=("params", "opt_state"))
def train_step(params, opt_state, batch, rng, *, cfg: DattnConfig, tx,
               hw: Tuple[int, int], mm_chunks: int = 1, remat=True,
               use_flash: bool = False, sp_mode: str = "gspmd",
               frozen: Tuple[str, ...] = (), grid_shape=None):
    loss, grads = jax.value_and_grad(loss_fn)(
        params, cfg, batch, rng, hw=hw, mm_chunks=mm_chunks, remat=remat,
        use_flash=use_flash, sp_mode=sp_mode, frozen=frozen,
        grid_shape=grid_shape)
    # fp32 optimizer math on (possibly) bf16 params — grads/moments/decay all
    # fp32, the update is applied in fp32 then cast back to the param dtype
    grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
    params32 = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    updates, opt_state = tx.update(grads, opt_state, params32)
    params = jax.tree.map(
        lambda p, p32, u: (p32 + u).astype(p.dtype), params, params32, updates)
    return params, opt_state, loss


def make_batch_hw(cfg: DattnConfig, total_frames: int) -> Tuple[int, int]:
    return budget_hw(total_frames, cfg.mm_image_pool_size,
                     cfg.vision.num_patches_per_side, cfg.mm_max_tokens_base)
