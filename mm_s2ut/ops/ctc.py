"""CTC loss as a static-shape lax.scan (for multitask heads, SURVEY.md F9,
and the wav2vec2-CTC eval ASR, SURVEY.md F15).

Standard alpha recursion over the extended label sequence (blanks
interleaved, 2L+1 states) in the log semiring. The time loop is a
``lax.scan`` (single compiled program, no Python loop); everything is
padded/masked so one compilation serves a whole bucket.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ctc_loss(
    logits: jnp.ndarray,  # (B, T, V) unnormalized
    logit_lengths: jnp.ndarray,  # (B,)
    labels: jnp.ndarray,  # (B, L) padded with any id
    label_lengths: jnp.ndarray,  # (B,)
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-example negative log likelihood, shape (B,)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    B, T, V = logp.shape
    L = labels.shape[1]
    S = 2 * L + 1

    # Extended labels: blank, l1, blank, l2, ..., blank.
    ext = jnp.full((B, S), blank_id, labels.dtype)
    ext = ext.at[:, 1::2].set(labels)

    # Transitions: from s-1 always; from s-2 iff ext[s] != blank and
    # ext[s] != ext[s-2].
    can_skip = jnp.zeros((B, S), bool)
    can_skip = can_skip.at[:, 2:].set(
        (ext[:, 2:] != blank_id) & (ext[:, 2:] != ext[:, :-2])
    )

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(logp[:, 0, blank_id])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, jnp.take_along_axis(logp[:, 0], ext[:, 1:2], 1)[:, 0], NEG_INF)
    )

    def step(alpha, t):
        prev1 = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(alpha, prev1), prev2)
        emit = jnp.take_along_axis(logp[:, t], ext, axis=1)
        new_alpha = merged + emit
        # Freeze past each sequence's end so the final readout is valid.
        new_alpha = jnp.where((t < logit_lengths)[:, None], new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))

    end = 2 * label_lengths  # index of final blank
    last_blank = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    last_label = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    last_label = jnp.where(label_lengths > 0, last_label, NEG_INF)
    ll = jnp.logaddexp(last_blank, last_label)
    return -ll


def ctc_greedy_decode(
    logits: jnp.ndarray,  # (B, T, V)
    logit_lengths: jnp.ndarray,  # (B,)
    blank_id: int = 0,
    pad_id: int = -1,
) -> jnp.ndarray:
    """Greedy CTC collapse: argmax per frame, merge repeats, drop blanks.
    Returns (B, T) padded with ``pad_id`` (host post-processing trims)."""
    ids = jnp.argmax(logits, axis=-1)
    B, T = ids.shape
    prev = jnp.concatenate([jnp.full((B, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    valid = (ids != blank_id) & (ids != prev)
    valid &= jnp.arange(T)[None, :] < logit_lengths[:, None]
    # Stable compaction: sort invalid positions to the end.
    order = jnp.argsort(~valid, axis=1, stable=True)
    collapsed = jnp.take_along_axis(ids, order, axis=1)
    keep = jnp.take_along_axis(valid, order, axis=1)
    return jnp.where(keep, collapsed, pad_id)
