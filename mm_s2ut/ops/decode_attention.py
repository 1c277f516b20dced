"""Fused beam-decode self-attention over an ancestry-indexed KV cache.

TPU-native replacement for the per-step KV-cache reorder that fairseq's
SequenceGenerator does on GPU (SURVEY.md F6; the reference free-rides on
``reorder_incremental_state``). Instead of physically permuting the cache
after every top-k selection, beam-search keeps each written row in the
beam *slot* that produced it and tracks a (B, K, T) ancestry table; this
kernel computes, for every live beam k:

    out_k = softmax_{(t,s) on k's path, + self}(q_k · K[t,s]) · V[t,s]

reading the cache exactly once per step, with the path membership test
((t, s) valid iff ancestry[k, t] == s and t < step) evaluated in-kernel
against a prefetched flattened index row — no (B, H, K, T, S) score
tensor ever touches HBM (the pure-XLA formulation materializes ~150 MB of
fp32 intermediates per step at B=8 K=5 T=200 and is as slow as the
physical reorder it replaces).

Layout contract (set by ``UnitDecoder.init_state``): the cache is ONE
buffer (B, L, H, T·S, 2·Dh) with key column j = t·S + s on the
second-to-last axis and K‖V *interleaved on the last axis* (k = x[..., :Dh],
v = x[..., Dh:]). Two reasons, both measured on v5e:

  * **128 lanes**: with Dh = 64 as the minor axis, XLA pads lanes 64→128
    (2× physical cache) and lowers the per-step dynamic_update_slice
    write as a FULL-CACHE copy (1.27 ms/step at B=32 — as expensive as
    the physical reorder this design removes). With 2·Dh = 128 exactly
    one lane tile, the same write is in-place and free (0.009 ms/step),
    and the cache is half the physical bytes.
  * the (t·S+s) axis sits directly above the contraction dim, so both
    attention matmuls are native MXU GEMMs in the cache's storage order,
    and each layer's (T·S, 2·Dh) slab is selected by this kernel's
    BlockSpec index map with no XLA-side slice.

The grid is (B, H); each program holds one head's full (T·S, 2·Dh) block
in VMEM (~257 KB bf16 at T=201, S=5) — a single-pass softmax, not an
online/flash loop, which only pays at far longer contexts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _kernel(flat_ref, q_ref, kn_ref, vn_ref, kv_ref, o_ref):
    # Blocks (None grid dims squeezed by BlockSpec); grid is (B,) — all
    # heads of one (batch, layer) are processed by one program so each
    # grid step issues ONE ~2 MB DMA instead of H small ones (measured
    # 2× read-bandwidth at B=32 vs the per-head grid):
    #   flat (K, T·S) int32 — per key column j=(t·S+s): j if (t, s) is on
    #   beam k's ancestry path and t < step, else -1 (precomputed on the
    #   XLA side once per step, shared across layers/heads)
    #   q / kn / vn (H, K, Dh); kv (H, T·S, 2·Dh) — this layer's
    #   interleaved K‖V slab, selected straight out of the decode cache
    #   by the BlockSpec index map (no XLA-side slice, which would copy
    #   the cache); o (H, K, Dh)
    #
    # Both attention contractions are H-batched dot_generals, NOT a
    # python loop over heads: Mosaic pipelines the batched form across
    # heads, measured 6.5× faster at K=5 / 1.2× at K=10 on v5e
    # (scripts_dev/decode_kernel_variants.py).
    H, K, Dh = q_ref.shape
    flat_rep = flat_ref[...]  # (K, T·S)
    TS = flat_rep.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_rep == col)[None]  # (1, K, T·S)
    q = q_ref[...]  # (H, K, Dh)
    kv = kv_ref[...]  # (H, T·S, 2·Dh)
    k2 = kv[:, :, :Dh]
    v2 = kv[:, :, Dh:]
    scores = jax.lax.dot_general(
        q, k2, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H, K, T·S)
    scores = jnp.where(on_path, scores, NEG_INF)
    self_logit = jnp.sum(
        q.astype(jnp.float32) * kn_ref[...].astype(jnp.float32),
        axis=2, keepdims=True,
    )  # (H, K, 1)
    m = jnp.maximum(jnp.max(scores, axis=2, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, axis=2, keepdims=True) + p_self
    w = (p / denom).astype(v2.dtype)
    out = jax.lax.dot_general(
        w, v2, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H, K, Dh)
    out = out + (p_self / denom) * vn_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _quantize_q(q: jnp.ndarray, k_new: jnp.ndarray):
    """XLA-side prep for the quantized-MXU kernels: per-(h, k) row int8
    quantization of q and the exact (full-precision-q) self-attention
    logit. Tiny (B·H·K·Dh) work, fused into the step by XLA."""
    qf = q.astype(jnp.float32)
    qs = jnp.max(jnp.abs(qf), axis=-1) / 127.0 + 1e-20  # (B, H, K)
    q8 = jnp.round(qf / qs[..., None]).astype(jnp.int8)
    self_logit = jnp.sum(
        qf * k_new.astype(jnp.float32), axis=-1
    )  # (B, H, K)
    return q8, qs, self_logit


def _kernel_i8(flat_ref, q8_ref, qs_ref, sl_ref, vn_ref, kv_ref, sk_ref,
               sv_ref, o_ref):
    # int8 cache variant: kv_ref is int8 with per-column (t·S+s), per-head
    # dequant scales sk/sv (H, T·S) f32, and q arrives int8 with per-row
    # scales qs (quantized on the XLA side). BOTH matmuls run on int8
    # MXU operands (2× the bf16 pass rate on v5e, and no int8→bf16
    # convert relayouts): the score matmul is exact integer accumulation
    # (s32 = Σ q8·k8, ≤ 2^20 < f32 mantissa) dequantized by qs·sk after;
    # the out matmul quantizes the sv-folded softmax weights per row
    # (w8 = round(w_eff/ws·127)) and dequantizes by ws after. Measured
    # 0.467 → 0.357 ms/call at B=128 K=10 T·S=2020 — the DMA floor
    # (scripts_dev/int8_mxu_kernel_variants.py). The self-attention logit
    # (current step's full-precision K) is precomputed on the XLA side
    # and passed as sl (H, K). H-batched dot_generals as in _kernel.
    H, K, Dh = q8_ref.shape
    flat_rep = flat_ref[...]  # (K, T·S)
    TS = flat_rep.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_rep == col)[None]  # (1, K, T·S)
    q8 = q8_ref[...]  # (H, K, Dh) int8
    kv = kv_ref[...]  # (H, T·S, 2·Dh) int8
    s32 = jax.lax.dot_general(
        q8, kv[:, :, :Dh], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (H, K, T·S)
    scores = (
        s32.astype(jnp.float32)
        * qs_ref[...][..., None]
        * sk_ref[...][:, None, :]
    )
    scores = jnp.where(on_path, scores, NEG_INF)
    self_logit = sl_ref[...][..., None]  # (H, K, 1)
    m = jnp.maximum(jnp.max(scores, axis=2, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, axis=2, keepdims=True) + p_self
    w_eff = (p / denom) * sv_ref[...][:, None, :]
    ws = jnp.max(w_eff, axis=2, keepdims=True) / 127.0 + 1e-20
    w8 = jnp.round(w_eff / ws).astype(jnp.int8)
    out32 = jax.lax.dot_general(
        w8, kv[:, :, Dh:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    out = out32.astype(jnp.float32) * ws
    out = out + (p_self / denom) * vn_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer", "interpret"))
def ancestry_decode_attention_i8(
    q: jnp.ndarray,        # (B, H, K, Dh), already scaled by Dh^-0.5
    k_new: jnp.ndarray,    # (B, H, K, Dh)
    v_new: jnp.ndarray,    # (B, H, K, Dh)
    kv: jnp.ndarray,       # (B, L, H, T·S, 2·Dh) int8 decode cache
    sk: jnp.ndarray,       # (B, L, H, T·S) f32 per-column K dequant scale
    sv: jnp.ndarray,       # (B, L, H, T·S) f32 per-column V dequant scale
    flat_rep: jnp.ndarray,
    layer: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-cache variant of :func:`ancestry_decode_attention`."""
    B, H, K, Dh = q.shape
    TS = kv.shape[3]
    q8, qs, sl = _quantize_q(q, k_new)
    out = pl.pallas_call(
        _kernel_i8,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, K, TS), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(
                (None, None, H, TS, 2 * Dh),
                lambda b: (b, layer, 0, 0, 0),
            ),
            pl.BlockSpec((None, None, H, TS), lambda b: (b, layer, 0, 0)),
            pl.BlockSpec((None, None, H, TS), lambda b: (b, layer, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), q.dtype),
        interpret=interpret,
    )(flat_rep.astype(jnp.int32), q8, qs, sl, v_new, kv, sk, sv)
    return out


def reference_i8(q, k_new, v_new, kv, sk, sv, flat_rep, layer):
    """XLA reference of the int8 quantized-MXU contraction (CPU/test
    fallback) — mirrors _kernel_i8's math exactly: int8-quantized q,
    integer score accumulation (exact in f32), per-row int8 requantized
    softmax weights."""
    B, H, K, Dh = q.shape
    q8, qs, sl = _quantize_q(q, k_new)
    slab = kv[:, layer]  # (B, H, T·S, 2Dh) int8
    TS = slab.shape[2]
    s_int = jnp.einsum(
        "bhkd,bhjd->bhkj",
        q8.astype(jnp.float32), slab[..., :Dh].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # exact: products ≤ 127², sums ≤ 2^20
    scores = s_int * qs[..., None] * sk[:, layer][:, :, None, :]
    col = jnp.arange(TS, dtype=jnp.int32)
    scores = jnp.where(flat_rep[:, None] == col, scores, NEG_INF)
    self_logit = sl[..., None]
    m = jnp.maximum(scores.max(axis=-1, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = p.sum(axis=-1, keepdims=True) + p_self
    w_eff = (p / denom) * sv[:, layer][:, :, None, :]
    ws = jnp.max(w_eff, axis=-1, keepdims=True) / 127.0 + 1e-20
    w8 = jnp.round(w_eff / ws)
    out = jnp.einsum(
        "bhkj,bhjd->bhkd", w8, slab[..., Dh:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * ws
    out = out + (p_self / denom) * v_new.astype(jnp.float32)
    return out.astype(q.dtype)


# -- int4 cache (half-split nibble packing) ---------------------------------
#
# Native jnp.int4 buffers don't survive this environment's device relay,
# so the int4 cache is hand-packed into int8: the packed slab is
# (B, L, H, T·S/2, 2·Dh) int8 where byte p holds logical key column p in
# its LOW nibble and column p + T·S/2 in its HIGH nibble. Properties this
# layout buys (vs packing adjacent columns):
#   * unpacking is concat([lo, hi], axis=columns) — natural column order,
#     so flat_rep, the scale arrays, and the on-path mask are IDENTICAL
#     to the int8 variant (no in-kernel permutes, no index remapping);
#   * with T even, the half boundary T·S/2 is a multiple of S, so a decode
#     step's S-column write never straddles it — one read-merge-write of
#     S bytes per step keeps the other nibble intact (required by the
#     serving ring, where both halves hold live rows simultaneously);
#   * growing the cache (beam-search segments) re-packs once per growth —
#     O(cache) amortized over the ≥64 steps the segment runs.
# The premise is measured, not assumed: the decode kernel is DMA-bound at
# the bench shape (halving slab bytes halves its time — 0.475 → 0.256
# ms/call at B=128 K=10 T·S=2010, 555 GB/s effective;
# scripts_dev/int4_premise_probe.py), so int4 ≈ 2× the dominant decode
# cost. Quantization: symmetric per column+head, scale = amax/7.


def i4_pack(cols: jnp.ndarray, P: int) -> jnp.ndarray:
    """Pack logical columns (..., C, lanes) int8 (values in [-8, 7]) into
    the half-split layout (..., P, lanes); C ≤ 2·P (missing columns are
    zero)."""
    C = cols.shape[-2]
    pad = [(0, 0)] * cols.ndim
    pad[-2] = (0, 2 * P - C)
    cols = jnp.pad(cols, pad)
    lo = cols[..., :P, :].astype(jnp.int32) & 0xF
    hi = cols[..., P:, :].astype(jnp.int32) & 0xF
    merged = lo | (hi << 4)  # [0, 255]
    return (merged - 256 * (merged >= 128)).astype(jnp.int8)


def i4_unpack(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`i4_pack`: (..., P, lanes) → (..., 2·P, lanes)
    int8, sign-extended."""
    wide = packed.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wide, 28), jnp.int32(28)
    )
    hi = jax.lax.shift_right_arithmetic(wide, jnp.int32(4))
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def i4_regrow(kv_packed: jnp.ndarray, P_new: int) -> jnp.ndarray:
    """Grow a half-split packed cache (..., P_old, lanes) to P_new ≥ its
    logical length / 2: the half boundary moves with the capacity, so
    every stored column must be re-paired. Pure int8 bit ops (shifts are
    bit-exact two's complement), one fused elementwise pass."""
    lo = kv_packed & 0xF                          # columns 0..P_old-1
    hi = jnp.right_shift(kv_packed, 4) & 0xF      # columns P_old..2P_old-1
    cols = jnp.concatenate([lo, hi], axis=-2)     # (..., 2·P_old, lanes)
    pad = [(0, 0)] * cols.ndim
    pad[-2] = (0, 2 * P_new - cols.shape[-2])
    cols = jnp.pad(cols, pad)
    return cols[..., :P_new, :] | jnp.left_shift(cols[..., P_new:, :], 4)


def _kernel_i4(flat_ref, q8_ref, qs_ref, sl_ref, vn_ref, kv_ref, sk_ref,
               sv_ref, o_ref):
    # int4 cache variant: kv_ref (H, T·S/2, 2·Dh) int8 nibble-packed (see
    # module comment). Unpack = int32 widen + two shifts back to int8
    # (Mosaic rejects int8-native shifts and cross-bitwidth bitcasts),
    # then the same quantized-MXU contraction as _kernel_i8, split per
    # half to avoid materializing an (H, T·S, ·) intermediate. Measured
    # 0.410 ms/call vs int8's 0.357 at the bench shape — the unpack VPU
    # cost exceeds the DMA it saves, so int4 is a MEMORY option (4× the
    # co-resident decodes), not a speed one.
    H, K, Dh = q8_ref.shape
    flat_rep = flat_ref[...]  # (K, T·S)
    TS = flat_rep.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (K, TS), 1)
    on_path = (flat_rep == col)[None]  # (1, K, T·S)
    q8 = q8_ref[...]  # (H, K, Dh) int8
    wide = kv_ref[...].astype(jnp.int32)  # (H, T·S/2, 2·Dh)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wide, 28), jnp.int32(28)
    ).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(wide, jnp.int32(4)).astype(jnp.int8)
    dims = (((2,), (2,)), ((0,), (0,)))
    s32 = jnp.concatenate(
        [
            jax.lax.dot_general(q8, lo[:, :, :Dh], dims,
                                preferred_element_type=jnp.int32),
            jax.lax.dot_general(q8, hi[:, :, :Dh], dims,
                                preferred_element_type=jnp.int32),
        ],
        axis=2,
    )  # (H, K, T·S)
    scores = (
        s32.astype(jnp.float32)
        * qs_ref[...][..., None]
        * sk_ref[...][:, None, :]
    )
    scores = jnp.where(on_path, scores, NEG_INF)
    self_logit = sl_ref[...][..., None]
    m = jnp.maximum(jnp.max(scores, axis=2, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = jnp.sum(p, axis=2, keepdims=True) + p_self
    w_eff = (p / denom) * sv_ref[...][:, None, :]
    ws = jnp.max(w_eff, axis=2, keepdims=True) / 127.0 + 1e-20
    w8 = jnp.round(w_eff / ws).astype(jnp.int8)
    P = TS // 2
    wv_dims = (((2,), (1,)), ((0,), (0,)))
    out32 = jax.lax.dot_general(
        w8[:, :, :P], lo[:, :, Dh:], wv_dims,
        preferred_element_type=jnp.int32,
    ) + jax.lax.dot_general(
        w8[:, :, P:], hi[:, :, Dh:], wv_dims,
        preferred_element_type=jnp.int32,
    )
    out = out32.astype(jnp.float32) * ws
    out = out + (p_self / denom) * vn_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer", "interpret"))
def ancestry_decode_attention_i4(
    q: jnp.ndarray,        # (B, H, K, Dh), already scaled by Dh^-0.5
    k_new: jnp.ndarray,    # (B, H, K, Dh)
    v_new: jnp.ndarray,    # (B, H, K, Dh)
    kv: jnp.ndarray,       # (B, L, H, T·S/2, 2·Dh) int8 nibble-packed
    sk: jnp.ndarray,       # (B, L, H, T·S) f32 per-column K dequant scale
    sv: jnp.ndarray,       # (B, L, H, T·S) f32 per-column V dequant scale
    flat_rep: jnp.ndarray,
    layer: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """int4-cache variant of :func:`ancestry_decode_attention`."""
    B, H, K, Dh = q.shape
    P = kv.shape[3]
    TS = 2 * P
    q8, qs, sl = _quantize_q(q, k_new)
    out = pl.pallas_call(
        _kernel_i4,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, K, TS), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(
                (None, None, H, P, 2 * Dh),
                lambda b: (b, layer, 0, 0, 0),
            ),
            pl.BlockSpec((None, None, H, TS), lambda b: (b, layer, 0, 0)),
            pl.BlockSpec((None, None, H, TS), lambda b: (b, layer, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), q.dtype),
        interpret=interpret,
    )(flat_rep.astype(jnp.int32), q8, qs, sl, v_new, kv, sk, sv)
    return out


def reference_i4(q, k_new, v_new, kv, sk, sv, flat_rep, layer):
    """XLA reference of the int4 quantized-MXU contraction (CPU/test
    fallback): unpack the layer's slab to int8 columns and delegate to
    the int8 reference (whose math _kernel_i4 mirrors exactly)."""
    slab = i4_unpack(kv[:, layer])  # (B, H, T·S, 2Dh) int8
    return reference_i8(
        q, k_new, v_new, slab[:, None], sk[:, layer][:, None],
        sv[:, layer][:, None], flat_rep, 0,
    )


def supported_i4(kv: jnp.ndarray) -> bool:
    """Pallas int4 kernel: real TPU, packed slab + its bf16 unpacked
    halves fit VMEM (the unpack intermediates are ~4× the packed bytes)."""
    if jax.devices()[0].platform in ("cpu", "gpu"):
        return False
    H, P, lanes = kv.shape[2], kv.shape[3], kv.shape[4]
    slab = H * P * lanes  # int8 bytes
    return 2 * slab + 5 * slab < 12 * 2**20


@functools.partial(jax.jit, static_argnames=("layer", "interpret"))
def ancestry_decode_attention(
    q: jnp.ndarray,        # (B, H, K, Dh), already scaled by Dh^-0.5
    k_new: jnp.ndarray,    # (B, H, K, Dh) — this step's projected key
    v_new: jnp.ndarray,    # (B, H, K, Dh)
    kv: jnp.ndarray,       # (B, L, H, T·S, 2·Dh) interleaved decode cache
    flat_rep: jnp.ndarray,  # (B, K, T·S) int32: key column id if on-path,
                            # -1 otherwise (see UnitDecoder.step)
    layer: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, K, Dh) in q.dtype.

    ``kv`` is the WHOLE stacked cache; the layer's K‖V slab is selected
    by the BlockSpec index map so no XLA-side slice (= full-cache copy,
    as expensive as the physical reorder this kernel removes) happens."""
    B, H, K, Dh = q.shape
    TS = kv.shape[3]
    grid = (B,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, K, TS), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(
                (None, None, H, TS, 2 * Dh),
                lambda b: (b, layer, 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((None, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), q.dtype),
        interpret=interpret,
    )(flat_rep.astype(jnp.int32), q, k_new, v_new, kv)
    return out


def _cross_block_rows(B: int, H: int, S: int, Dh: int, K: int,
                      slab_itemsize: int, i8: bool) -> int:
    """Batch rows per cross-kernel program. Blocking NB rows grows the
    slab DMA NB× and cuts the program count NB× — at B=128 the grid-(B,)
    kernel is per-program-overhead-bound, not DMA-bound (measured 0.640
    → 0.420 ms per 6-layer step at NB=16, B=128 K=10 S=250 int8;
    scripts_dev/cross_block_probe.py). Capped by VMEM: double-buffered
    slab + scales + bias must fit comfortably."""
    budget = 13 * 2**20
    for nb in (16, 8, 4, 2, 1):
        if B % nb:
            continue
        slab = nb * H * S * 2 * Dh * slab_itemsize
        # The kernel's k2/v2 slices materialize in VMEM (for i8, as bf16
        # dequant copies = 2 bytes/elem regardless of slab dtype), and the
        # f32 score rows live alongside exp/weight intermediates — count
        # them or the compiler's scoped-vmem allocator rejects the kernel
        # at the bench shape (observed 18.8 MB > 16 MB at nb=16, S=250).
        deq = 2 * nb * H * S * Dh * 2
        scores = 3 * nb * H * K * S * 4
        scales = 2 * 2 * nb * H * S * 4 if i8 else 0
        bias = 2 * nb * K * S * 4
        if 2 * slab + deq + scores + scales + bias < budget:
            return nb
    return 1


def _kernel_cross(q_ref, kv_ref, bias_ref, o_ref):
    # NB batch rows per program: the packed encoder K‖V slab
    # (NB, H, S, 2·Dh) arrives in one DMA; both contractions run
    # (NB·H)-batched (same rationale as _kernel). bias (NB, K, S) f32:
    # 0 on valid source positions, -inf on padding — pre-broadcast over
    # K on the host side because an in-kernel sublane broadcast that
    # crosses a tile boundary (K > 8) crashes Mosaic
    # ("limits[i] <= dim(i)").
    NB, H, K, Dh = q_ref.shape
    S = kv_ref.shape[2]
    q = q_ref[...].reshape(NB * H, K, Dh)
    kv = kv_ref[...]  # (NB, H, S, 2·Dh)
    k2 = kv[:, :, :, :Dh].reshape(NB * H, S, Dh)
    v2 = kv[:, :, :, Dh:].reshape(NB * H, S, Dh)
    scores = jax.lax.dot_general(
        q, k2, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).reshape(NB, H, K, S)
    scores = scores + bias_ref[...][:, None]  # broadcast over H only
    m = jnp.max(scores, axis=3, keepdims=True)
    p = jnp.exp(scores - m)
    w = (p / jnp.sum(p, axis=3, keepdims=True)).astype(v2.dtype)
    out = jax.lax.dot_general(
        w.reshape(NB * H, K, S), v2,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = out.reshape(NB, H, K, Dh).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_decode_attention(
    q: jnp.ndarray,     # (B, H, K, Dh), already scaled by Dh^-0.5
    kv: jnp.ndarray,    # (B, H, S, 2·Dh) packed encoder K‖V
    bias: jnp.ndarray,  # (B, S) f32 additive mask (0 valid / -inf pad)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode-time cross-attention (one HBM read of the encoder
    K/V per (batch, layer, step), both matmuls in-kernel — replaces the
    two-einsum XLA path whose intermediates round-trip HBM)."""
    B, H, K, Dh = q.shape
    S = kv.shape[2]
    nb = _cross_block_rows(B, H, S, Dh, K, kv.dtype.itemsize, i8=False)
    bias_k = jnp.broadcast_to(bias.astype(jnp.float32)[:, None, :], (B, K, S))
    return pl.pallas_call(
        _kernel_cross,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((nb, H, S, 2 * Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((nb, K, S), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), q.dtype),
        interpret=interpret,
    )(q, kv, bias_k)


def _kernel_cross_i8(q_ref, kv_ref, sk_ref, sv_ref, bias_ref, o_ref):
    # int8 variant of _kernel_cross: the encoder K‖V slab is stored
    # quantized (per source column s, per head) so the per-step HBM read
    # — paid once per (batch, layer, step) for the WHOLE decode — is half
    # the bf16 slab. Scale folding mirrors _kernel_i8: K's scale
    # multiplies the score rows after the q·k matmul, V's folds into the
    # softmax weights before the w·v matmul. NB batch rows per program
    # (see _cross_block_rows).
    NB, H, K, Dh = q_ref.shape
    S = kv_ref.shape[2]
    q = q_ref[...].reshape(NB * H, K, Dh)
    kv = kv_ref[...]  # (NB, H, S, 2·Dh) int8
    k2 = kv[:, :, :, :Dh].astype(q.dtype).reshape(NB * H, S, Dh)
    v2 = kv[:, :, :, Dh:].astype(q.dtype).reshape(NB * H, S, Dh)
    scores = jax.lax.dot_general(
        q, k2, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).reshape(NB, H, K, S)
    scores = scores * sk_ref[...][:, :, None, :]
    scores = scores + bias_ref[...][:, None]  # broadcast over H only
    m = jnp.max(scores, axis=3, keepdims=True)
    p = jnp.exp(scores - m)
    w = ((p / jnp.sum(p, axis=3, keepdims=True))
         * sv_ref[...][:, :, None, :]).astype(v2.dtype)
    out = jax.lax.dot_general(
        w.reshape(NB * H, K, S), v2,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = out.reshape(NB, H, K, Dh).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_decode_attention_i8(
    q: jnp.ndarray,     # (B, H, K, Dh), already scaled by Dh^-0.5
    kv: jnp.ndarray,    # (B, H, S, 2·Dh) packed encoder K‖V, int8
    sk: jnp.ndarray,    # (B, H, S) f32 per-column K dequant scale
    sv: jnp.ndarray,    # (B, H, S) f32 per-column V dequant scale
    bias: jnp.ndarray,  # (B, S) f32 additive mask (0 valid / -inf pad)
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-cache variant of :func:`cross_decode_attention`."""
    B, H, K, Dh = q.shape
    S = kv.shape[2]
    nb = _cross_block_rows(B, H, S, Dh, K, kv.dtype.itemsize, i8=True)
    bias_k = jnp.broadcast_to(bias.astype(jnp.float32)[:, None, :], (B, K, S))
    return pl.pallas_call(
        _kernel_cross_i8,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, H, K, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((nb, H, S, 2 * Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((nb, H, S), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, H, S), lambda b: (b, 0, 0)),
            pl.BlockSpec((nb, K, S), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, H, K, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, K, Dh), q.dtype),
        interpret=interpret,
    )(q, kv, sk, sv, bias_k)


def cross_reference_i8(q, kv, sk, sv, bias):
    """XLA reference of the int8 cross contraction (CPU/test fallback):
    dequantize the slab and delegate to :func:`cross_reference`."""
    Dh = q.shape[-1]
    slab = kv.astype(jnp.float32)
    k_deq = slab[..., :Dh] * sk[..., None]
    v_deq = slab[..., Dh:] * sv[..., None]
    deq = jnp.concatenate([k_deq, v_deq], axis=-1).astype(q.dtype)
    return cross_reference(q, deq, bias)


def cross_supported(kv: jnp.ndarray) -> bool:
    """Pallas cross kernel: real TPU, slab fits VMEM."""
    if jax.devices()[0].platform in ("cpu", "gpu"):
        return False
    H, S, lanes = kv.shape[1], kv.shape[2], kv.shape[3]
    return 2 * H * S * lanes * jnp.dtype(kv.dtype).itemsize < 12 * 2**20


def cross_reference(q, kv, bias):
    """XLA reference of the fused cross-attention contraction."""
    Dh = q.shape[-1]
    k2 = kv[..., :Dh]
    v2 = kv[..., Dh:]
    scores = jnp.einsum(
        "bhkd,bhsd->bhks", q, k2, preferred_element_type=jnp.float32
    )
    scores = scores + bias.astype(jnp.float32)[:, None, None, :]
    w = jax.nn.softmax(scores, axis=-1).astype(v2.dtype)
    out = jnp.einsum("bhks,bhsd->bhkd", w, v2)
    return out.astype(q.dtype)


def supported(kv: jnp.ndarray) -> bool:
    """Pallas path: real TPU only (tests exercise the kernel in
    interpreter mode; CPU/GPU fall back to the XLA formulation), and only
    when one (H, T·S, 2·Dh) layer slab plus the flat index row fits VMEM
    with double buffering — very long decode budgets (the fairseq
    max-target-positions clamp is 3000) or fp32 small models fall back to
    the XLA formulation rather than OOMing scoped VMEM at compile time."""
    if jax.devices()[0].platform in ("cpu", "gpu"):
        return False
    H, TS, lanes = kv.shape[2], kv.shape[3], kv.shape[4]
    itemsize = jnp.dtype(kv.dtype).itemsize
    slab = H * TS * lanes * itemsize
    flat = TS * 4 * 2  # int32 flat_rep row per beam (K small)
    return 2 * (slab + 8 * flat) < 12 * 2**20


def reference(
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    kv: jnp.ndarray,
    flat_rep: jnp.ndarray,
    layer: int,
) -> jnp.ndarray:
    """XLA reference of the same contraction (CPU/test fallback)."""
    B, H, K, Dh = q.shape
    TS = kv.shape[3]
    k_cache = kv[:, layer, :, :, :Dh]  # (B, H, T·S, Dh)
    v_cache = kv[:, layer, :, :, Dh:]
    scores = jnp.einsum(
        "bhkd,bhjd->bhkj", q, k_cache, preferred_element_type=jnp.float32
    )
    col = jnp.arange(TS, dtype=jnp.int32)
    scores = jnp.where(
        (flat_rep[:, None] == col), scores, NEG_INF
    )
    self_logit = jnp.sum(
        q.astype(jnp.float32) * k_new.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, H, K, 1)
    m = jnp.maximum(scores.max(axis=-1, keepdims=True), self_logit)
    p = jnp.exp(scores - m)
    p_self = jnp.exp(self_logit - m)
    denom = p.sum(axis=-1, keepdims=True) + p_self
    w = (p / denom).astype(v_cache.dtype)
    out = jnp.einsum(
        "bhkj,bhjd->bhkd", w, v_cache,
        preferred_element_type=jnp.float32,
    )
    out = out + (p_self / denom) * v_new.astype(jnp.float32)
    return out.astype(q.dtype)
