"""Batched beam search as one fixed-shape jitted program.

TPU-native replacement for fairseq's SequenceGenerator (SURVEY.md F6;
invoked by the reference at scripts/textless/2_inference.sh:34-43 with
--beam 10 --max-len-a 1 --max-len-b 200). Everything is static-shape:

* the decode loop is a ``lax.while_loop`` with an early-exit condition
  (all batches finished or no alive beam can beat the worst finished
  hypothesis under the length penalty);
* the self-attention KV cache is ONE buffer (B, L, H, max_len·K, 2·Dh)
  with key column j = t·K + slot and K‖V interleaved on the (128-lane)
  last axis, and is NEVER physically reordered: each
  row stays in the beam slot that wrote it and a (B, K, T) ancestry table
  records which slot holds each step of each live beam's prefix — a fused
  Pallas kernel (ops/decode_attention.py) attends jointly over all K
  slots with an ancestry-match mask, reading the cache exactly once per
  step and never rewriting it;
* cross-attention K/V is projected once from the encoder output and
  tiled per beam — never recomputed, never reordered (all beams of a
  batch element share it);
* scoring follows fairseq: hypothesis score = Σ log p / (len)^lenpen,
  candidates drawn from the top 2K so EOS never starves the beam.

max_len follows the fairseq rule max_len = min(a·src_len + b, max_pos)
(computed from the *padded* source frames at trace time: static shape,
per-batch early exit handles the slack).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


def _reorder_ancestry(
    state: Any, indices: jnp.ndarray, step: jnp.ndarray
) -> Any:
    """Record this step's beam selection in the ancestry table instead of
    physically reordering the KV cache.

    ``state["ancestry"]`` (B, K, T) maps each live beam's time step t to
    the *physical slot* whose cache row holds that step's K/V. Rows never
    move (the decoder's joint-beam masked attention reads through this
    table); the per-step cost drops from a full cache read+write
    (0.82 ms/step measured at B=8 K=5 T=200, 12 layers) to a (B, K, T)
    int32 gather — ~4 KB."""
    anc = state["ancestry"]
    new_anc = jnp.take_along_axis(anc, indices[..., None], axis=1)
    new_anc = jax.lax.dynamic_update_slice_in_dim(
        new_anc, indices[..., None].astype(anc.dtype), step, axis=2
    )
    return {**state, "ancestry": new_anc}


def _length_norm(length: jnp.ndarray, alpha: float) -> jnp.ndarray:
    return jnp.maximum(length, 1).astype(jnp.float32) ** alpha


@partial(
    jax.jit,
    static_argnames=(
        "decode_step",
        "batch_size",
        "beam_size",
        "max_len",
        "eos_id",
        "bos_id",
        "pad_id",
        "vocab_size",
        "len_penalty",
        "unk_penalty",
        "unk_id",
        "max_new",
    ),
)
def beam_search(
    decode_step: Callable[[jnp.ndarray, Any], Tuple[jnp.ndarray, Any]],
    init_state: Any,
    batch_size: int,
    *,
    beam_size: int = 10,
    max_len: int = 200,
    eos_id: int = 2,
    bos_id: int = 2,
    pad_id: int = 1,
    vocab_size: int = 1004,
    len_penalty: float = 1.0,
    unk_penalty: float = 0.0,
    unk_id: int = 3,
    prefix_tokens: Optional[jnp.ndarray] = None,
    prefix_len: Optional[jnp.ndarray] = None,
    prefix_logp: Optional[jnp.ndarray] = None,
    max_new: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run beam search.

    ``decode_step(tokens (N,1), state) -> (logits (N,V), state)`` where
    N = batch_size·beam_size; ``init_state`` must already be tiled to N.
    Returns (sequences (B, K, max_len) padded with pad_id — EOS included —
    and scores (B, K) length-normalized, best first).

    ``init_state`` may also be a tuple/list of per-model state dicts
    (logit-ensemble decoding, UnitGenerator): ``decode_step`` then
    receives/returns the tuple, and the cache bookkeeping (ancestry
    reorder, segmented growth) applies to every member.

    Prefix-constrained continuation (streaming prefix-reuse decode,
    infer/streaming.py): pass ``prefix_tokens`` (B, P) with position 0 =
    BOS, the dynamic ``prefix_len`` scalar (tokens incl. BOS) and
    ``prefix_logp`` (B,) — the state must already be prefilled
    (``UnitDecoder.prefill``: cache columns < prefix_len − 1 written at
    slot 0, ``state["step"] == prefix_len − 1``). The search then starts
    at step prefix_len − 1 with the prefix as the sole live beam, so its
    cost is O(continuation), not O(prefix). ``max_new`` (static) bounds
    the continuation length — the per-chunk decode budget; global step
    semantics (length penalty, the EOS-at-max_len force) are unchanged,
    so an empty prefix reproduces the unconstrained search. Segmented
    cache growth is disabled in prefix mode (shrinking would drop the
    prefilled columns; the prefix already paid the fill).
    """
    B, K, V = batch_size, beam_size, vocab_size
    if V < 2:
        raise ValueError(f"vocab_size must be >= 2, got {V}")
    multi = isinstance(init_state, (tuple, list))
    init_states = tuple(init_state) if multi else (init_state,)

    prefixed = prefix_tokens is not None
    alive_seq = jnp.full((B, K, max_len + 1), pad_id, jnp.int32)
    alive_seq = alive_seq.at[:, :, 0].set(bos_id)
    if prefixed:
        P = prefix_tokens.shape[1]
        row = jnp.full((B, max_len + 1), pad_id, jnp.int32)
        row = row.at[:, :P].set(prefix_tokens.astype(jnp.int32))
        pos = jnp.arange(max_len + 1)[None, :]
        row = jnp.where(pos < prefix_len, row, pad_id)
        alive_seq = jnp.broadcast_to(
            row[:, None, :], (B, K, max_len + 1)
        ).astype(jnp.int32)
    # Only beam 0 is live initially (identical prefixes would duplicate).
    alive_logp = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32)[None], (B, 1)
    )
    if prefixed and prefix_logp is not None:
        alive_logp = alive_logp.at[:, 0].set(
            jnp.asarray(prefix_logp, jnp.float32).reshape(B)
        )
    start = (
        jnp.maximum(jnp.asarray(prefix_len, jnp.int32) - 1, 0)
        if prefixed else jnp.zeros((), jnp.int32)
    )
    fin_seq = jnp.full((B, K, max_len + 1), pad_id, jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)
    fin_flags = jnp.zeros((B, K), bool)

    def body(carry):
        step, alive_seq, alive_logp, fin_seq, fin_scores, fin_flags, states = carry
        prev_tok = jax.lax.dynamic_slice_in_dim(
            alive_seq.reshape(B * K, max_len + 1), step, 1, axis=1
        )
        logits, new_state = decode_step(
            prev_tok, states if multi else states[0]
        )
        states = tuple(new_state) if multi else (new_state,)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if unk_penalty != 0.0:
            logp = logp.at[:, unk_id].add(-unk_penalty)
        logp = logp.reshape(B, K, V)
        # fairseq SequenceGenerator semantics: the length budget forces the
        # final token to EOS (lprobs masked to eos-only at step >= max_len).
        eos_only = jnp.full((V,), NEG_INF, jnp.float32).at[eos_id].set(0.0)
        logp = jnp.where(step + 1 >= max_len, eos_only[None, None], logp)

        cand = alive_logp[:, :, None] + logp  # (B, K, V)
        # Exact two-stage top-2K: at most 2K of the global top-2K can share
        # one beam row, so the per-beam top-2K pool provably contains them.
        # K rows of length V sort much faster on TPU than one row of K·V
        # (top_k cost grows superlinearly with row length), and tie-breaking
        # (value desc, then beam-major flat index) matches the single-stage
        # form: stage 1 orders within-beam ties by vocab index, stage 2
        # orders cross-beam ties by (beam, rank) — both beam-major.
        # k1 = min(2K, V): a beam can contribute at most V candidates, so
        # the per-beam pool stays provably exhaustive for small vocabs
        # (top_k with k > V is a trace-time error).
        k1 = min(2 * K, V)
        s1, i1 = jax.lax.top_k(cand, k1)  # (B, K, k1) over V
        top_scores, pidx = jax.lax.top_k(s1.reshape(B, k1 * K), 2 * K)
        top_beam = pidx // k1  # (B, 2K)
        top_tok = jnp.take_along_axis(i1.reshape(B, k1 * K), pidx, axis=1)

        # Candidate sequences (B, 2K, L+1).
        seq2k = jnp.take_along_axis(alive_seq, top_beam[..., None], axis=1)
        seq2k = jax.lax.dynamic_update_slice_in_dim(
            seq2k, top_tok[..., None].astype(jnp.int32), step + 1, axis=2
        )
        is_eos = top_tok == eos_id

        # ---- update finished set with EOS candidates ----
        # normalized score; fairseq: sum_logprob / length^lenpen, length
        # counts the generated tokens incl. EOS.
        norm = _length_norm(jnp.asarray(step + 1), len_penalty)
        cand_fin_scores = jnp.where(is_eos, top_scores / norm, NEG_INF)
        all_fin_seq = jnp.concatenate([fin_seq, seq2k], axis=1)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        all_fin_flags = jnp.concatenate([fin_flags, is_eos], axis=1)
        new_fin_scores, fin_top = jax.lax.top_k(all_fin_scores, K)
        new_fin_seq = jnp.take_along_axis(all_fin_seq, fin_top[..., None], axis=1)
        new_fin_flags = jnp.take_along_axis(all_fin_flags, fin_top, axis=1)

        # ---- pick top-K non-EOS as the next alive set ----
        alive_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        new_alive_logp, alive_top = jax.lax.top_k(alive_cand_scores, K)
        new_alive_seq = jnp.take_along_axis(seq2k, alive_top[..., None], axis=1)
        src_beam = jnp.take_along_axis(top_beam, alive_top, axis=1)  # (B, K)
        states = tuple(_reorder_ancestry(s, src_beam, step) for s in states)

        return (
            step + 1,
            new_alive_seq,
            new_alive_logp,
            new_fin_seq,
            new_fin_scores,
            new_fin_flags,
            states,
        )

    # Segmented execution: run with a small KV cache first and grow it
    # geometrically (64 → 128 → … → max_len+1). The per-step reorder and
    # attention reads scale with the *current* cache size, so early steps
    # (and early-exiting decodes) pay a fraction of the full-cache cost.
    def cond_until(seg_end):
        def cond(carry):
            step, alive_seq, alive_logp, fin_seq, fin_scores, fin_flags, state = carry
            not_done = step < seg_end
            if max_new is not None:
                not_done = jnp.logical_and(not_done, step < start + max_new)
            best_alive = alive_logp[:, 0] / _length_norm(
                jnp.asarray(max_len), len_penalty
            )
            worst_fin = jnp.where(fin_flags, fin_scores, NEG_INF).min(axis=1)
            improvable = jnp.any(
                jnp.logical_or(~fin_flags.all(axis=1), best_alive > worst_fin)
            )
            return jnp.logical_and(not_done, improvable)
        return cond

    kv_full = init_states[0]["self_kv"]  # (B, L, H, T·K (÷2 if int4), 2·Dh)
    # int4 nibble-packed caches (half-split layout, decode_attention.py)
    # have a 2:1 scale-to-slab shape ratio; their physical axis is half
    # the logical flattened length, and growth must RE-PACK (the half
    # boundary moves with the capacity), not pad.
    int4 = (
        "self_kv_sk" in init_states[0]
        and init_states[0]["self_kv_sk"].shape[3] == 2 * kv_full.shape[3]
    )
    pack_div = 2 if int4 else 1
    T_full = kv_full.shape[3] * pack_div // K
    caps = []
    if not prefixed:
        c = 64
        while c < T_full:
            caps.append(c)
            c *= 2
    caps.append(T_full)

    def shrink(st):
        s0 = {
            **st,
            # Slicing the packed int4 slab reinterprets its half boundary,
            # which is harmless only because the cache is still EMPTY here.
            "self_kv": st["self_kv"][:, :, :, : caps[0] * K // pack_div],
            "ancestry": st["ancestry"][:, :, : caps[0]],
        }
        for skey in ("self_kv_sk", "self_kv_sv"):  # int8/int4 dequant scales
            if skey in st:
                s0[skey] = st[skey][:, :, :, : caps[0] * K]
        return s0

    def grow(st, cap):
        kv = st["self_kv"]
        if int4:
            from mm_s2ut.ops.decode_attention import i4_regrow

            kv_grown = i4_regrow(kv, cap * K // 2)
        else:
            kv_grown = jnp.pad(
                kv,
                ((0, 0), (0, 0), (0, 0),
                 (0, cap * K - kv.shape[3]), (0, 0)),
            )
        grown = {
            "self_kv": kv_grown,
            "ancestry": jnp.pad(
                st["ancestry"],
                ((0, 0), (0, 0), (0, cap - st["ancestry"].shape[2])),
            ),
        }
        for skey in ("self_kv_sk", "self_kv_sv"):
            if skey in st:
                grown[skey] = jnp.pad(
                    st[skey],
                    ((0, 0), (0, 0), (0, 0),
                     (0, cap * K - st[skey].shape[3])),
                )
        return {**st, **grown}

    carry = (
        start, alive_seq, alive_logp,
        fin_seq, fin_scores, fin_flags, tuple(shrink(s) for s in init_states),
    )
    for i, cap in enumerate(caps):
        if i > 0:
            carry = (*carry[:-1], tuple(grow(s, cap) for s in carry[-1]))
        seg_end = min(cap, max_len)
        carry = jax.lax.while_loop(cond_until(seg_end), body, carry)
    step, alive_seq, alive_logp, fin_seq, fin_scores, fin_flags, _ = carry

    # Fall back to alive beams where nothing finished.
    none_fin = ~fin_flags.any(axis=1)
    alive_norm = alive_logp / _length_norm(step, len_penalty)
    fin_seq = jnp.where(none_fin[:, None, None], alive_seq, fin_seq)
    fin_scores = jnp.where(none_fin[:, None], alive_norm, fin_scores)
    # Strip the BOS column: hypotheses are tokens 1..max_len.
    return fin_seq[:, :, 1:], fin_scores


def tile_state_for_beams(state: Any, beam_size: int) -> Any:
    """Expand the self-attention cache's flattened time axis by the beam
    count, (B, L, H, T, 2·Dh) → (B, L, H, T·K, 2·Dh) with key column
    j = t·K + slot, and attach the (B, K, T) beam-ancestry table (all
    zeros: before any selection the only live beam is slot 0 and the mask
    ignores unwritten positions). The cache is empty at this point, so
    the expansion is a fresh zeros allocation, not a copy.

    Cross-attention K/V and the cross bias stay at batch size B: the
    decoder's cross-attention broadcasts queries over beams instead
    (MultiHeadAttention beam-broadcast path) so encoder K/V reads don't
    scale with beam width."""
    kv = state["self_kv"]
    B = kv.shape[0]
    # int4 nibble-packed caches carry half the logical columns per
    # physical position (2:1 scale-to-slab ratio); the ancestry table is
    # sized by LOGICAL steps.
    T_logical = (
        state["self_kv_sk"].shape[3]
        if "self_kv_sk" in state else kv.shape[3]
    )
    shape = list(kv.shape)
    shape[3] = kv.shape[3] * beam_size
    out = {
        **state,
        "self_kv": jnp.zeros(shape, kv.dtype),
        "ancestry": jnp.zeros((B, beam_size, T_logical), jnp.int32),
    }
    for key in ("self_kv_sk", "self_kv_sv"):  # int8/int4 dequant scales
        if key in state:
            s_shape = list(state[key].shape)
            s_shape[3] = T_logical * beam_size
            out[key] = jnp.zeros(s_shape, state[key].dtype)
    return out


def trim_hypothesis(tokens, eos_id: int = 2, pad_id: int = 1):
    """Host-side: cut a generated row at its first EOS (exclusive)."""
    out = []
    for t in tokens:
        t = int(t)
        if t == eos_id:
            break
        if t != pad_id:
            out.append(t)
    return out
