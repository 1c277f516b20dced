"""Training criterions: label-smoothed CE (+R-Drop, +multitask CTC).

TPU-native replacement for the fairseq ``speech_to_unit`` criterion the
reference trains with (reference scripts/textless/1_train.sh:110) and the
plugin's ``speech_to_unit_v2`` R-Drop variant (reference
criterions/speech_to_speech_criterion.py:33-132 — dead code there, wired
for real here; SURVEY.md §1). Pure functions over logits: they compose into
the jitted train step, and metric aggregation is a plain pytree reduction
(no per-worker logging dict machinery — ``psum`` handles cross-replica
reduction inside the compiled step).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mm_s2ut import registry
from mm_s2ut.ops.ctc import ctc_loss


def label_smoothed_nll_loss(
    logits: jnp.ndarray,  # (B, T, V) float32
    targets: jnp.ndarray,  # (B, T) int
    epsilon: float = 0.0,
    pad_id: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sum-reduced label-smoothed CE ignoring pad positions.

    Matches fairseq semantics: smoothed loss =
    (1-eps)·nll + eps·(mean over vocab of -log p). Returns
    (loss_sum, ntokens, metrics).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    mask = (targets != pad_id).astype(jnp.float32)
    nll = nll * mask
    smooth = smooth * mask
    loss = (1.0 - epsilon) * nll + epsilon * smooth
    ntokens = mask.sum()
    n_correct = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32) * mask
    metrics = {
        "nll_loss": nll.sum(),
        "n_correct": n_correct.sum(),
        "ntokens": ntokens,
    }
    return loss.sum(), ntokens, metrics


def kl_symmetric(
    logits_p: jnp.ndarray, logits_q: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 1
) -> jnp.ndarray:
    """Symmetric KL for R-Drop (reference RdropLabelSmoothedCE import,
    criterions/speech_to_speech_criterion.py:16-29): sum over non-pad
    positions of KL(p||q)+KL(q||p)."""
    lp = jax.nn.log_softmax(logits_p.astype(jnp.float32), axis=-1)
    lq = jax.nn.log_softmax(logits_q.astype(jnp.float32), axis=-1)
    p, q = jnp.exp(lp), jnp.exp(lq)
    kl_pq = (p * (lp - lq)).sum(-1)
    kl_qp = (q * (lq - lp)).sum(-1)
    mask = (targets != pad_id).astype(jnp.float32)
    return ((kl_pq + kl_qp) * mask).sum() / 2.0


@registry.register_criterion("speech_to_unit")
def speech_to_unit_criterion(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    label_smoothing: float = 0.2,
    pad_id: int = 1,
    ctc_weight: float = 0.0,
    ctc_blank_id: int = 0,
    **unused,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Main S2UT loss: label-smoothed CE over unit logits (+ optional
    encoder-CTC multitask term, SURVEY.md F9). Returns (loss_sum, metrics);
    callers normalize by ntokens (fairseq sample_size convention)."""
    logits = outputs["logits"]
    if logits.shape[1] > batch["target"].shape[1]:
        # n_frames_per_step > 1: the decoder expands each packed position
        # to n sub-frame logits (Lp·n columns); the unpacked target has
        # n·(Lp−1)+1 — the trailing n−1 positions after the EOS group
        # have no target (fairseq TransformerUnitDecoder slices the same
        # way).
        logits = logits[:, : batch["target"].shape[1]]
    loss, ntokens, metrics = label_smoothed_nll_loss(
        logits, batch["target"], label_smoothing, pad_id
    )
    if ctc_weight > 0 and "ctc_logits" in outputs:
        enc_mask = outputs["encoder_padding_mask"]
        input_lengths = (~enc_mask).sum(-1)
        tgt_mask = batch["multitask_target"] != pad_id
        ctc = ctc_loss(
            outputs["ctc_logits"],
            input_lengths,
            batch["multitask_target"],
            tgt_mask.sum(-1),
            blank_id=ctc_blank_id,
        ).sum()
        loss = loss + ctc_weight * ctc
        metrics["ctc_loss"] = ctc
    # Auxiliary multitask heads (F9): weighted per-task CTC/CE terms
    # (reference MultitaskCriterion aggregation,
    # criterions/speech_to_speech_criterion.py:58-102).
    mt_logits = outputs.get("multitask_logits") or {}
    mt_targets = batch.get("multitask_targets") or {}
    for task in unused.get("multitask", ()):
        name = task.task_name
        if name not in mt_logits or name not in mt_targets:
            continue
        tgt = mt_targets[name]
        if task.decoder_type == "ctc":
            enc_mask = outputs["encoder_padding_mask"]
            tmask = tgt != pad_id
            aux = ctc_loss(
                mt_logits[name], (~enc_mask).sum(-1), tgt, tmask.sum(-1),
                blank_id=ctc_blank_id,
            ).sum()
        else:
            aux, _, aux_m = label_smoothed_nll_loss(
                mt_logits[name], tgt, task.label_smoothing, pad_id
            )
        loss = loss + task.loss_weight * aux
        metrics[f"{name}_loss"] = aux
    metrics["loss"] = loss
    return loss, metrics


@registry.register_criterion("speech_to_unit_v2")
def speech_to_unit_rdrop_criterion(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    label_smoothing: float = 0.2,
    pad_id: int = 1,
    rdrop_alpha: float = 0.0,
    outputs_b: Optional[Dict[str, jnp.ndarray]] = None,
    **kwargs,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """R-Drop variant (reference speech_to_unit_v2): two stochastic forward
    passes, CE on both + α·symmetric-KL between them. ``outputs_b`` is the
    second pass's outputs; without it, falls back to plain CE."""
    loss, metrics = speech_to_unit_criterion(
        outputs, batch, label_smoothing, pad_id, **kwargs
    )
    if outputs_b is not None and rdrop_alpha > 0:
        loss_b, _ = speech_to_unit_criterion(
            outputs_b, batch, label_smoothing, pad_id, **kwargs
        )
        Tt = batch["target"].shape[1]
        kl = kl_symmetric(
            outputs["logits"][:, :Tt], outputs_b["logits"][:, :Tt],
            batch["target"], pad_id,
        )
        loss = loss + loss_b + rdrop_alpha * kl
        metrics["kl_loss"] = kl
        metrics["loss"] = loss
    return loss, metrics
