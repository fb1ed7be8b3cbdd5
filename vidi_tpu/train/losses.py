"""Training loss: shifted CE with the hard-example `loss_thres` filter
(reference: Vidi1.5_9B/vidi/model/lmm/dattn/gemma.py:571-590)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vidi_tpu.constants import IGNORE_INDEX


def shifted_cross_entropy(
    logits: jnp.ndarray,  # [B, T, V] (already final-softcapped)
    labels: jnp.ndarray,  # [B, T] int, IGNORE_INDEX masked
    loss_thres: Optional[float] = None,
) -> jnp.ndarray:
    """labels are padded by one then shifted so tokens < n predict n
    (gemma.py:576-581); per-token losses are 0 at ignored positions, and with
    `loss_thres` the mean runs only over tokens with loss > thres — unless
    every token is below, in which case all non-zero-loss tokens count."""
    labels = jnp.pad(labels, ((0, 0), (0, 1)), constant_values=IGNORE_INDEX)
    shift_labels = labels[:, 1:].reshape(-1)
    logits = logits.astype(jnp.float32).reshape(-1, logits.shape[-1])

    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_loss = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    tok_loss = jnp.where(valid, tok_loss, 0.0)  # matches F.cross_entropy none-reduction

    if loss_thres is None:
        denom = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(tok_loss) / denom

    all_below = jnp.all(tok_loss < loss_thres)
    thres = jnp.where(all_below, 0.0, loss_thres)
    sel = tok_loss > thres
    denom = jnp.maximum(jnp.sum(sel), 1)
    return jnp.sum(jnp.where(sel, tok_loss, 0.0)) / denom
