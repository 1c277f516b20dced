"""Fused attention kernels (Pallas TPU) + XLA reference.

The encoder/fusion attention at our scale (T ≤ ~1k post-subsample frames,
577 image tokens, head_dim 64) fits a simple high-throughput shape: tile
the query axis, keep each head's full K/V resident in VMEM, and compute
softmax(QKᵀ)·V per tile in one pass — the (B, H, T, S) logits never touch
HBM, softmax runs in fp32 on the VPU, and both matmuls hit the MXU.
(An online-softmax flash variant only pays off at much longer S; this
full-KV kernel is the right point for this workload.)

``attention(...)`` dispatches: Pallas on TPU for aligned shapes,
reference XLA einsum otherwise (and under tests/CPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def on_tpu() -> bool:
    """Trace-time platform check shared by the kernel dispatch sites
    (fwd dispatcher, bwd gate, encoder pad-to-sublane) — one predicate so
    a future platform decision edits one line."""
    return jax.devices()[0].platform not in ("cpu", "gpu")


# Opt-in fused Pallas backward (measured slightly behind XLA recompute on
# v5e — see _flash_bwd). Read ONCE at import: the custom-VJP trace is
# cached by the enclosing jit, so a post-trace env flip would silently do
# nothing; process-start scope makes A/B timing honest.
import os as _os  # noqa: E402

FLASH_BWD_PALLAS = _os.environ.get("MM_FLASH_BWD", "") == "pallas"


# Counter-based dropout hash (attention-weight dropout inside the fused
# kernel): the keep/drop decision for weight (bh, q, k) is a pure integer
# mix of its absolute coordinates and a per-call seed, so the Pallas
# forward tiles and the XLA recompute in the backward reproduce the SAME
# mask from iotas alone — nothing is stored, and tiling does not change
# the stream. The mixer is a murmur3-style finalizer; dropout needs
# decorrelated bits, not crypto.
_H1 = np.uint32(0x85EBCA6B)
_H2 = np.uint32(0xC2B2AE35)
_H3 = np.uint32(0x27D4EB2F)


def _mix(x: jnp.ndarray) -> jnp.ndarray:
    x = x ^ (x >> 16)
    x = x * _H1
    x = x ^ (x >> 13)
    x = x * _H2
    x = x ^ (x >> 16)
    return x


def dropout_keep(
    bh: jnp.ndarray,  # (...,) uint32 batch·head coordinate
    qpos: jnp.ndarray,  # (...,) uint32 absolute query position
    kpos: jnp.ndarray,  # (...,) uint32 absolute key position
    seed: jnp.ndarray,  # () uint32 per-call seed
    rate: float,
) -> jnp.ndarray:
    """Boolean keep-mask, broadcast over the operands' common shape.

    ONE finalizer round over an odd-multiplier coordinate injection: the
    hash runs over B·H·T² logits, so its VPU cost grows QUADRATICALLY
    with sequence length while model FLOPs don't — at T_src=4000 the
    original three-round mix cost ~2.2 ms of a 14.9 ms train step
    (round-5 ablation, scripts_dev/train_attn_probe.py). A single
    avalanche round after distinct-odd-constant mixing decorrelates
    plenty for dropout (the keep-rate and independence tests in
    tests/test_attention.py gate it); this is regularization noise, not
    crypto."""
    h = _mix(
        qpos.astype(jnp.uint32) * _H3
        ^ (kpos.astype(jnp.uint32) * _H1)
        ^ (bh.astype(jnp.uint32) * _H2)
        ^ seed
    )
    # Top 24 bits -> uniform [0, 1). Route the cast through int32:
    # Mosaic has no uint32 -> float32 lowering, and 24 bits always fit
    # the positive int32 range.
    u = (h >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return u >= rate


def reference_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,  # (B, Tk, H, D)
    bias: Optional[jnp.ndarray] = None,  # (B, 1|H, Tq|1, Tk) additive
    causal: bool = False,
    window: int = 0,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        # Position-causal (+ optional bounded left window); query and
        # key positions are aligned (self-attention).
        qpos = jnp.arange(q.shape[1])[:, None]
        kpos = jnp.arange(k.shape[1])[None, :]
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        logits = jnp.where(allowed[None, None], logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and dropout_seed is None:
        # Mirror flash_attention: silently training WITHOUT attention
        # dropout on the fallback path would make regularization
        # platform/shape-dependent.
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_rate > 0.0:
        B, Tq, H, _ = q.shape
        S = k.shape[1]
        bh = (jnp.arange(B)[:, None] * H + jnp.arange(H)[None, :]).astype(jnp.uint32)
        keep = dropout_keep(
            bh[:, :, None, None],
            jnp.arange(Tq, dtype=jnp.uint32)[None, None, :, None],
            jnp.arange(S, dtype=jnp.uint32)[None, None, None, :],
            dropout_seed.astype(jnp.uint32),
            dropout_rate,
        )
        weights = jnp.where(keep, weights, 0.0) / (1.0 - dropout_rate)
        weights = weights.astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref,
    *, scale: float, block_q: int, causal: bool, window: int,
    dropout_rate: float, nb: int,
):
    # q: (nb, block_q, D); k/v: (nb, S, D); bias: (nb, 1, S) additive
    # fp32; seed: (1, 1) uint32 in SMEM.  ``nb`` batch·head rows per
    # program: at short S (e.g. 256 post-subsample encoder rows) the
    # one-head-per-program grid launches hundreds of tiny programs and
    # the per-program overhead dominates — same finding as the round-3
    # cross-decode kernel blocking.  Inputs stay bf16 into the MXU (fp32
    # accumulate via preferred_element_type); scale folds into the fp32
    # logits.
    logits = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nb, block_q, S)
    logits = logits * scale + bias_ref[:]
    S = logits.shape[-1]
    q0 = pl.program_id(1) * block_q
    if causal:
        # The causal/window mask is computed on the VPU from iotas — the
        # dense (B, 1, T, T) bias the XLA path materializes never exists.
        qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, S), 1)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, S), 2)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        logits = jnp.where(allowed, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = p / denom
    if dropout_rate > 0.0:
        # Attention-weight dropout from the counter-based hash: absolute
        # coordinates (grid ids + iotas) reproduce the identical mask in
        # the XLA backward recompute — nothing is stored.
        bh = (
            jnp.uint32(pl.program_id(0) * nb)
            + jax.lax.broadcasted_iota(jnp.uint32, (nb, block_q, S), 0)
        )
        qpos_u = (
            q0 + jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, S), 1)
        ).astype(jnp.uint32)
        kpos_u = jax.lax.broadcasted_iota(jnp.uint32, (nb, block_q, S), 2)
        keep = dropout_keep(bh, qpos_u, kpos_u, seed_ref[0, 0], dropout_rate)
        w = jnp.where(keep, w, 0.0) * (1.0 / (1.0 - dropout_rate))
    w = w.astype(v_ref.dtype)
    o_ref[:] = jax.lax.dot_general(
        w, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _attn_kernel_causal_skip(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, logits_scr,
    *, scale: float, block_q: int, block_k: int, window: int,
    dropout_rate: float, nb: int,
):
    """Causal forward with k-block skipping: query block i only computes
    score/context GEMMs against key blocks that intersect its allowed
    band [q0 − window, q0 + block_q), skipping the strictly-above-diagonal
    rectangle the dense kernel paid for (≈2× of the attention FLOPs at
    full causal; more with a bounded window). K/V stay fully VMEM-resident
    (same DMA as the dense kernel — the waste removed is MXU work); the
    softmax runs once over the full width from a NEG_INF-initialized
    scratch, so no online-softmax state is needed."""
    i = pl.program_id(1)
    q0 = i * block_q
    S = k_ref.shape[1]
    nkb = S // block_k
    # Key blocks [lo, hi) intersect the allowed band. No scratch init is
    # needed: every column outside [lo·bk, hi·bk) is outside the
    # causal/window band by construction, so the explicit mask below
    # kills whatever garbage the unfilled scratch holds.
    hi = jnp.minimum((q0 + block_q + block_k - 1) // block_k, nkb)
    lo = jnp.maximum(q0 - window, 0) // block_k if window > 0 else 0

    def fill(j, _):
        kj = k_ref[:, pl.ds(j * block_k, block_k), :]
        lj = jax.lax.dot_general(
            q_ref[:], kj, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits_scr[:, :, pl.ds(j * block_k, block_k)] = lj
        return 0

    jax.lax.fori_loop(lo, hi, fill, 0)
    logits = logits_scr[:] * scale + bias_ref[:]
    qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, S), 1)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, S), 2)
    allowed = kpos <= qpos
    if window > 0:
        allowed = jnp.logical_and(allowed, kpos > qpos - window)
    logits = jnp.where(allowed, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = p / denom
    if dropout_rate > 0.0:
        bh = (
            jnp.uint32(pl.program_id(0) * nb)
            + jax.lax.broadcasted_iota(jnp.uint32, (nb, block_q, S), 0)
        )
        qpos_u = qpos.astype(jnp.uint32)
        kpos_u = kpos.astype(jnp.uint32)
        keep = dropout_keep(bh, qpos_u, kpos_u, seed_ref[0, 0], dropout_rate)
        w = jnp.where(keep, w, 0.0) * (1.0 / (1.0 - dropout_rate))
    # Mosaic has no dynamic_slice on register values: round-trip the
    # weights through the VMEM scratch so the context loop can take
    # pl.ds ref slices per key block.
    logits_scr[:] = w

    def ctx(j, acc):
        wj = logits_scr[:, :, pl.ds(j * block_k, block_k)].astype(v_ref.dtype)
        vj = v_ref[:, pl.ds(j * block_k, block_k), :]
        return acc + jax.lax.dot_general(
            wj, vj, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        lo, hi, ctx, jnp.zeros((nb, block_q, q_ref.shape[2]), jnp.float32)
    )
    o_ref[:] = acc.astype(o_ref.dtype)


def _causal_block_k(S: int) -> int:
    """Key-block size for the causal-skip kernel: lane-aligned, dividing
    S, with ≥4 blocks so there is actually work to skip (a 1-2 block
    grid pays the scratch round-trip for no FLOP savings — measured a
    2× LOSS at S=512/bk=512). 0 = use the dense kernel."""
    for bk in (512, 256, 128):
        if S % bk == 0 and S // bk >= 4:
            return bk
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "interpret", "causal", "window",
                     "dropout_rate", "block_k"),
)
def _flash_call(q, k, v, bias, seed, scale, block_q, interpret,
                causal=False, window=0, dropout_rate=0.0, block_k=None):
    B, Tq, H, D = q.shape
    S = k.shape[1]
    # Causal dispatch — MEASURED on v5e (scripts_dev/causal_tpu_probe.py,
    # min-of-rounds timing): the dense kernel beats XLA's folded-bias
    # route at T ∈ {512, 2000, 4000} (0.88 vs 0.90 / 1.06 vs 2.11 /
    # 1.70 vs 8.21 ms), and ALSO beats the k-block-skipping variant at
    # T ≥ 2000 (skip 1.55/2.20) — the scratch round-trips outweigh the
    # halved GEMM work at D=64. (The round-4 "flash loses to XLA" probe
    # lacked min-of-rounds and was relay-inflated.) Default: dense;
    # ``block_k`` opts into the skip kernel, with key-axis padding to a
    # block multiple — padded keys sit at kpos ≥ S > every qpos, so the
    # in-kernel causal mask kills them (bias padded NEG_INF as well).
    if block_k is None:
        bk0 = 0
    else:
        bk0 = block_k
    if causal and bk0 and S % bk0:
        S_pad = -(-S // bk0) * bk0
        pad = ((0, 0), (0, S_pad - S), (0, 0), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, 0), (0, S_pad - S)),
            constant_values=NEG_INF,
        )
        S = S_pad
    # Lay out (B*H) on the leading grid axis; per head: (Tq, D) x (S, D).
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    biash = jnp.broadcast_to(bias, (B, H, 1, S)).reshape(B * H, 1, S)
    seed_arr = jnp.reshape(seed.astype(jnp.uint32), (1, 1))

    # Head-axis blocking: nb batch·head rows per program, VMEM-capped —
    # q/k/v/bias tiles + fp32 (block_q, S) intermediates per row (the
    # causal-skip kernel adds a scratch logits buffer).
    n_inter = 3 if (causal and bk0 and S % bk0 == 0) else 2
    per_row = (
        (block_q * D + 2 * S * D) * q.dtype.itemsize
        + S * (q.dtype.itemsize + 4)
        + n_inter * block_q * S * 4
    )
    nb = max(1, min(B * H, int(6e6) // max(per_row, 1)))
    while (B * H) % nb:
        nb -= 1

    grid = ((B * H) // nb, pl.cdiv(Tq, block_q))
    in_specs = [
        pl.BlockSpec((nb, block_q, D), lambda h, i: (h, i, 0)),
        pl.BlockSpec((nb, S, D), lambda h, i: (h, 0, 0)),
        pl.BlockSpec((nb, S, D), lambda h, i: (h, 0, 0)),
        pl.BlockSpec((nb, 1, S), lambda h, i: (h, 0, 0)),
        pl.BlockSpec(
            (1, 1), lambda h, i: (0, 0), memory_space=pltpu.SMEM
        ),
    ]
    out_spec = pl.BlockSpec((nb, block_q, D), lambda h, i: (h, i, 0))
    bk = bk0
    if causal and bk and S % bk == 0:
        # k-block skipping: ~2× fewer attention FLOPs under a causal
        # mask (more with a window) — the dense kernel computed the full
        # rectangle and lost to XLA's fused path at causal probe shapes
        # (PLAN.md round-4, 3.55 vs 1.96 ms at B=16 T=512).
        out = pl.pallas_call(
            functools.partial(
                _attn_kernel_causal_skip, scale=scale, block_q=block_q,
                block_k=bk, window=window, dropout_rate=dropout_rate,
                nb=nb,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
            scratch_shapes=[pltpu.VMEM((nb, block_q, S), jnp.float32)],
            interpret=interpret,
        )(qh, kh, vh, biash, seed_arr)
    else:
        out = pl.pallas_call(
            functools.partial(
                _attn_kernel, scale=scale, block_q=block_q,
                causal=causal, window=window, dropout_rate=dropout_rate,
                nb=nb,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
            interpret=interpret,
        )(qh, kh, vh, biash, seed_arr)
    return out.reshape(B, H, Tq, D).transpose(0, 2, 1, 3)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
    *, scale: float, block_q: int, causal: bool, window: int,
    dropout_rate: float, nb: int, tq: int,
):
    """Fused attention backward, one pass: recomputes the softmax from
    the saved inputs (full K/V resident — no online-softmax state), then
      dP  = dO · Vᵀ            dW = dP ⊙ M/(1−p)
      dS  = W ⊙ (dW − Σₖ dW W)   (softmax VJP, pre-dropout W)
      dQ  = scale · dS · K       (written per (h, i) block)
      dK  = scale · dSᵀ · Q      (accumulated over q-blocks)
      dV  = (W ⊙ M/(1−p))ᵀ · dO  (accumulated)
      dbias = Σ_q dS             (accumulated)
    The dropout mask M is regenerated from the same counter-based hash
    as the forward — bit-identical, nothing was stored. The (T, T)
    logits of the XLA recompute path never touch HBM."""
    i = pl.program_id(1)
    logits = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nb, block_q, S)
    logits = logits * scale + bias_ref[:]
    S = logits.shape[-1]
    q0 = i * block_q
    qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, S), 1)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, S), 2)
    if causal:
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        logits = jnp.where(allowed, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    # Rows past Tq are block padding: their recomputed w / garbage dO
    # must not leak into the accumulated dK/dV/dbias.
    w = jnp.where(qpos < tq, w, 0.0)

    if dropout_rate > 0.0:
        bh = (
            jnp.uint32(pl.program_id(0) * nb)
            + jax.lax.broadcasted_iota(jnp.uint32, (nb, block_q, S), 0)
        )
        keep = dropout_keep(
            bh, qpos.astype(jnp.uint32), kpos.astype(jnp.uint32),
            seed_ref[0, 0], dropout_rate,
        )
        mscale = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
    else:
        mscale = None

    # Padded q-rows read unspecified q/dO (NaN in interpret mode); w is
    # already zeroed there, but 0 · NaN = NaN in every contraction that
    # touches them — zero the rows themselves.
    rowvalid = (
        q0 + jax.lax.broadcasted_iota(jnp.int32, (nb, block_q, 1), 1)
    ) < tq
    do_ = jnp.where(rowvalid, do_ref[:].astype(jnp.float32), 0.0)
    qz = jnp.where(rowvalid, q_ref[:].astype(jnp.float32), 0.0)
    dP = jax.lax.dot_general(
        do_, v_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nb, block_q, S)
    dP = jnp.where(qpos < tq, dP, 0.0)
    dW = dP * mscale if mscale is not None else dP
    dS = w * (dW - jnp.sum(dW * w, axis=-1, keepdims=True))
    wd = w * mscale if mscale is not None else w

    dq = jax.lax.dot_general(
        dS, k_ref[:].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[:] = dq.astype(dq_ref.dtype)

    dk_new = jax.lax.dot_general(
        dS, qz, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (nb, S, D)
    dv_new = jax.lax.dot_general(
        wd, do_, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nb, S, D)
    dbias_new = jnp.sum(dS, axis=1, keepdims=True)  # (nb, 1, S)

    @pl.when(i == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dk_ref[:] = dk_ref[:] + dk_new
    dv_ref[:] = dv_ref[:] + dv_new
    dbias_ref[:] = dbias_ref[:] + dbias_new


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "interpret", "causal", "window",
                     "dropout_rate"),
)
def _flash_bwd_call(q, k, v, bias, seed, g, scale, block_q, interpret,
                    causal, window, dropout_rate):
    B, Tq, H, D = q.shape
    S = k.shape[1]
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    gh = g.transpose(0, 2, 1, 3).reshape(B * H, Tq, D)
    biash = jnp.broadcast_to(bias, (B, H, 1, S)).reshape(B * H, 1, S)
    seed_arr = jnp.reshape(seed.astype(jnp.uint32), (1, 1))

    # VMEM cap: q/dO/dq tiles + k/v + f32 dK/dV accumulators + four
    # (block_q, S) f32 intermediates per row.
    per_row = (
        (3 * block_q * D + 2 * S * D) * q.dtype.itemsize
        + 2 * S * D * 4 + 4 * block_q * S * 4 + S * 8
    )
    nb = max(1, min(B * H, int(6e6) // max(per_row, 1)))
    while (B * H) % nb:
        nb -= 1

    grid = ((B * H) // nb, pl.cdiv(Tq, block_q))
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, scale=scale, block_q=block_q, causal=causal,
            window=window, dropout_rate=dropout_rate, nb=nb, tq=Tq,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, block_q, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((nb, S, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((nb, S, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((nb, 1, S), lambda h, i: (h, 0, 0)),
            pl.BlockSpec(
                (1, 1), lambda h, i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((nb, block_q, D), lambda h, i: (h, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, block_q, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((nb, S, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((nb, S, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((nb, 1, S), lambda h, i: (h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, 1, S), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, vh, biash, seed_arr, gh)
    dq = dq.reshape(B, H, Tq, D).transpose(0, 2, 1, 3)
    dk = dk.reshape(B, H, S, D).transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv.reshape(B, H, S, D).transpose(0, 2, 1, 3).astype(v.dtype)
    # bias primal is (B, 1|H, 1, S) broadcast over heads/rows: reduce the
    # per-head sums back to the primal shape.
    dbias = dbias.reshape(B, H, 1, S)
    if bias.shape[1] == 1:
        dbias = dbias.sum(axis=1, keepdims=True)
    return dq, dk, dv, dbias.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash(q, k, v, bias, seed, scale, block_q, interpret, causal, window,
           dropout_rate):
    return _flash_call(q, k, v, bias, seed, scale, block_q, interpret,
                       causal, window, dropout_rate)


def _flash_fwd(q, k, v, bias, seed, scale, block_q, interpret, causal,
               window, dropout_rate):
    # Save only the inputs (flash-style): the backward recomputes the
    # softmax via the XLA reference path, whose VJP XLA fuses well. This
    # keeps the Pallas forward usable under jax.grad (pallas_call has no
    # autodiff rule) at the cost of one extra forward in the backward —
    # the same trade jax.checkpoint makes. Under dropout the recompute
    # rebuilds the identical keep-mask from (seed, positions) via
    # dropout_keep, so gradients flow through exactly the weights the
    # forward kept.
    out = _flash_call(q, k, v, bias, seed, scale, block_q, interpret,
                      causal, window, dropout_rate)
    return out, (q, k, v, bias, seed)


def _flash_bwd(scale, block_q, interpret, causal, window, dropout_rate,
               res, g):
    q, k, v, bias, seed = res
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    # Measured on v5e (DESIGN.md round 4): the XLA dense recompute+VJP
    # fuses well enough that the fused Pallas backward is a slight LOSS
    # at both the common shape (11.6 vs 11.1 ms/step at S=256) and the
    # long-source shape (15.1 vs 14.8 at S=1000) — XLA hides the (T, T)
    # HBM round trips behind the surrounding GEMMs at these sizes.
    # Recorded negative result; the kernel stays as an opt-in
    # (MM_FLASH_BWD=pallas, read at import — FLASH_BWD_PALLAS) for
    # memory-bound regimes and remains the interpret-mode test target.
    if interpret or (on_tpu() and FLASH_BWD_PALLAS):
        # Fused Pallas backward: recompute softmax per tile + the four
        # VJP matmuls in one pass — the (T, T) logits of the XLA
        # recompute path never touch HBM.
        dq, dk, dv, dbias = _flash_bwd_call(
            q, k, v, bias, seed, g, scale, block_q, interpret,
            causal, window, dropout_rate,
        )
        return dq, dk, dv, dbias, dseed
    dq, dk, dv, dbias = _flash_bwd_xla(
        q, k, v, bias, seed, g, scale, causal, window, dropout_rate
    )
    return dq, dk, dv, dbias, dseed


def _flash_bwd_xla(q, k, v, bias, seed, g, scale, causal, window,
                   dropout_rate):
    """Default production backward: XLA dense recompute + VJP. The
    counter-based dropout hash regenerates the forward kernel's exact
    mask from (seed, coordinates) — tested directly against the Pallas
    backward in tests/test_attention.py."""
    _, vjp = jax.vjp(
        lambda q, k, v, bias: reference_attention(
            q * scale, k, v, bias, causal=causal, window=window,
            dropout_rate=dropout_rate, dropout_seed=seed,
        ),
        q, k, v, bias,
    )
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Tk) True=pad
    scale: Optional[float] = None,
    block_q: int = 128,
    interpret: bool = False,
    causal: bool = False,
    window: int = 0,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, Tq, H, D) attention with the full-KV-in-VMEM Pallas kernel.
    Scale defaults to D^-1/2 (pass 1.0 for pre-scaled queries).
    ``causal`` applies a position-causal mask (+ optional bounded left
    ``window``) computed from iotas inside the kernel — no dense (T, T)
    bias is materialized. Requires Tq == Tk (self-attention).
    ``dropout_rate`` applies attention-weight dropout via the in-kernel
    counter-based hash (``dropout_keep``); ``dropout_seed`` is a uint32
    scalar varied per call/layer by the caller.
    Differentiable: backward recomputes via the XLA reference path (with
    the identical hash mask under dropout)."""
    B, Tq, H, D = q.shape
    S = k.shape[1]
    if causal and Tq != S:
        raise ValueError("causal flash attention requires Tq == Tk")
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    scale = D**-0.5 if scale is None else scale
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
        bias = bias[:, None, None, :]
    else:
        bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    block_q = min(block_q, max(Tq, 8))
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.uint32)
    return _flash(q, k, v, bias, dropout_seed, scale, block_q, interpret,
                  causal, window, float(dropout_rate))


def attention(
    q, k, v,
    key_padding_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    causal: bool = False,
    window: int = 0,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
):
    """Dispatch: Pallas kernel on TPU for clean shapes, XLA otherwise."""
    B, Tq, H, D = q.shape
    S = k.shape[1]
    if use_pallas is None:
        use_pallas = (
            on_tpu() and bias is None and D % 8 == 0 and S % 8 == 0 and Tq >= 8
            and (not causal or Tq == S)
        )
    if use_pallas:
        if bias is not None:
            # flash_attention takes only a key-padding mask; silently
            # dropping an additive bias would return plausible-but-
            # unmasked attention. (Causal/window masks are first-class
            # kernel arguments — pass causal=/window=, not a bias.)
            raise ValueError(
                "use_pallas=True does not support an additive bias — "
                "pass key_padding_mask/causal/window, or leave use_pallas "
                "unset"
            )
        return flash_attention(
            q, k, v, key_padding_mask, scale, causal=causal, window=window,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        )
    scale = D**-0.5 if scale is None else scale
    if bias is None and key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0)[:, None, None, :]
    return reference_attention(
        q * scale, k, v, bias, causal=causal, window=window,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed,
    )
