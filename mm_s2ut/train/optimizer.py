"""Optimizer + LR schedule (SURVEY.md F1/F2).

Mirrors the reference's training recipe (scripts/textless/1_train.sh:114-117):
Adam(0.9, 0.98), inverse-sqrt warmup schedule (warmup-init-lr 1e-7, 10k
updates), global-norm clipping at 10, gradient accumulation via
``optax.MultiSteps`` (update-freq 16). bf16 forward + fp32 params needs no
loss scaling (the reference's --fp16 scaler is obsolete on TPU, F3).
"""
from __future__ import annotations

import optax

from mm_s2ut.config import TrainConfig


def inverse_sqrt_schedule(
    lr: float, warmup_updates: int, warmup_init_lr: float
) -> optax.Schedule:
    """Linear warmup from warmup_init_lr to lr, then lr·sqrt(warmup/step)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.maximum(step, 1)
        warm = warmup_init_lr + (lr - warmup_init_lr) * step / max(warmup_updates, 1)
        decay = lr * (warmup_updates / step) ** 0.5
        return jnp.where(step < warmup_updates, warm, decay)

    return schedule


def build_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.lr_scheduler == "inverse_sqrt":
        return inverse_sqrt_schedule(cfg.lr, cfg.warmup_updates, cfg.warmup_init_lr)
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(cfg.lr)
    raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")


def build_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm) if cfg.clip_norm > 0 else optax.identity(),
        optax.scale_by_adam(b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps),
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay > 0 else optax.identity(),
        optax.scale_by_schedule(build_schedule(cfg)),
        optax.scale(-1.0),
    )
    if cfg.update_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.update_freq)
    return tx
