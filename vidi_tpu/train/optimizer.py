"""Optimizer: AdamW with the reference's 8 parameter groups and freeze masks.

Reference semantics (Vidi1.5_9B/vidi/train/vidi_trainer.py:146-220 +
train/train.py:150-175):
- groups: {base, mm_rand, mm_vis, mm_aud} x {decay, no_decay}, with per-group
  learning rates (mm_rand_lr / mm_vis_lr / mm_aud_lr, defaulting to the base
  LR) and weight decay only on non-norm weights;
- freeze flags: train_rand / train_vis / train_aud / train_llm choose which
  modules train at all (frozen -> no update, no optimizer state).

Built from optax primitives; hyperparameters from scripts/finetune.sh:46-53
(betas 0.9/0.95, eps 1e-5, wd 0.1, cosine schedule, 3% warmup).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class TrainHParams:
    learning_rate: float = 1e-5
    mm_rand_lr: Optional[float] = 2e-5
    mm_vis_lr: Optional[float] = None
    mm_aud_lr: Optional[float] = None
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    eps: float = 1e-5
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    train_rand: bool = True
    train_vis: bool = False
    train_aud: bool = False
    train_llm: bool = True
    grad_clip: Optional[float] = None


def _module_of(path) -> str:
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    return {"text": "base", "vision": "mm_vis", "audio": "mm_aud", "mm": "mm_rand"}[top]


def _is_no_decay(path, leaf) -> bool:
    """Norm weights and 1-D tensors get no weight decay (HF convention the
    reference inherits via get_decay_parameter_names)."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf.ndim <= 1 or "norm" in name.lower() or name in ("input_ln", "post_attn_ln", "pre_ffn_ln", "post_ffn_ln", "final_ln")


def _trainable(module: str, hp: TrainHParams) -> bool:
    return {
        "base": hp.train_llm,
        "mm_rand": hp.train_rand,
        "mm_vis": hp.train_vis,
        "mm_aud": hp.train_aud,
    }[module]


def param_labels(params, hp: TrainHParams):
    def label(path, leaf):
        mod = _module_of(path)
        if not _trainable(mod, hp):
            return "frozen"
        return f"{mod}_{'nodecay' if _is_no_decay(path, leaf) else 'decay'}"

    return jax.tree_util.tree_map_with_path(label, params)


def lr_schedule(hp: TrainHParams, lr: float):
    """The cosine/warmup schedule every param group uses (finetune.sh:44-46:
    cosine, warmup_ratio 0.03). Exposed so loggers can report the current LR."""
    warmup = max(int(hp.total_steps * hp.warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(hp.total_steps, warmup + 1), end_value=0.0)


def make_optimizer(params, hp: TrainHParams) -> optax.GradientTransformation:
    def schedule_for(lr: float):
        return lr_schedule(hp, lr)

    lrs = {
        "base": hp.learning_rate,
        "mm_rand": hp.mm_rand_lr or hp.learning_rate,
        "mm_vis": hp.mm_vis_lr or hp.learning_rate,
        "mm_aud": hp.mm_aud_lr or hp.learning_rate,
    }

    def adamw(lr: float, decay: float):
        steps = [optax.scale_by_adam(b1=hp.beta1, b2=hp.beta2, eps=hp.eps,
                                     mu_dtype=jnp.float32)]
        if decay:
            steps.append(optax.add_decayed_weights(decay))
        steps.append(optax.scale_by_schedule(schedule_for(lr)))
        steps.append(optax.scale(-1.0))
        return optax.chain(*steps)

    transforms = {"frozen": optax.set_to_zero()}
    for mod, lr in lrs.items():
        transforms[f"{mod}_decay"] = adamw(lr, hp.weight_decay)
        transforms[f"{mod}_nodecay"] = adamw(lr, 0.0)

    tx = optax.multi_transform(transforms, param_labels(params, hp))
    if hp.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(hp.grad_clip), tx)
    return tx
