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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def reference_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,  # (B, Tk, H, D)
    bias: Optional[jnp.ndarray] = None,  # (B, 1|H, Tq|1, Tk) additive
    causal: bool = False,
    window: int = 0,
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
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref,
    *, scale: float, block_q: int, causal: bool, window: int,
):
    # q: (block_q, D); k/v: (S, D); bias: (1, S) additive fp32.
    # Inputs stay bf16 into the MXU (fp32 accumulate via
    # preferred_element_type); scale folds into the fp32 logits.
    logits = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, S)
    logits = logits * scale + bias_ref[:]
    if causal:
        # The causal/window mask is computed on the VPU from iotas — the
        # dense (B, 1, T, T) bias the XLA path materializes never exists.
        S = logits.shape[-1]
        q0 = pl.program_id(1) * block_q
        qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, S), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, S), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        logits = jnp.where(allowed, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v_ref.dtype)
    o_ref[:] = jnp.dot(w, v_ref[:], preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "interpret", "causal", "window")
)
def _flash_call(q, k, v, bias, scale, block_q, interpret, causal=False, window=0):
    B, Tq, H, D = q.shape
    S = k.shape[1]
    # Lay out (B*H) on the leading grid axis; per head: (Tq, D) x (S, D).
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    biash = jnp.broadcast_to(bias, (B, H, 1, S)).reshape(B * H, 1, S)

    grid = (B * H, pl.cdiv(Tq, block_q))
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, block_q=block_q,
            causal=causal, window=window,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((None, S, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((None, S, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((None, 1, S), lambda h, i: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda h, i: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, biash)
    return out.reshape(B, H, Tq, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, bias, scale, block_q, interpret, causal, window):
    return _flash_call(q, k, v, bias, scale, block_q, interpret, causal, window)


def _flash_fwd(q, k, v, bias, scale, block_q, interpret, causal, window):
    # Save only the inputs (flash-style): the backward recomputes the
    # softmax via the XLA reference path, whose VJP XLA fuses well. This
    # keeps the Pallas forward usable under jax.grad (pallas_call has no
    # autodiff rule) at the cost of one extra forward in the backward —
    # the same trade jax.checkpoint makes.
    out = _flash_call(q, k, v, bias, scale, block_q, interpret, causal, window)
    return out, (q, k, v, bias)


def _flash_bwd(scale, block_q, interpret, causal, window, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q, k, v, bias: reference_attention(
            q * scale, k, v, bias, causal=causal, window=window
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
) -> jnp.ndarray:
    """(B, Tq, H, D) attention with the full-KV-in-VMEM Pallas kernel.
    Scale defaults to D^-1/2 (pass 1.0 for pre-scaled queries).
    ``causal`` applies a position-causal mask (+ optional bounded left
    ``window``) computed from iotas inside the kernel — no dense (T, T)
    bias is materialized. Requires Tq == Tk (self-attention).
    Differentiable: backward recomputes via the XLA reference path."""
    B, Tq, H, D = q.shape
    S = k.shape[1]
    if causal and Tq != S:
        raise ValueError("causal flash attention requires Tq == Tk")
    scale = D**-0.5 if scale is None else scale
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
        bias = bias[:, None, None, :]
    else:
        bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    block_q = min(block_q, max(Tq, 8))
    return _flash(q, k, v, bias, scale, block_q, interpret, causal, window)


def attention(
    q, k, v,
    key_padding_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    causal: bool = False,
    window: int = 0,
):
    """Dispatch: Pallas kernel on TPU for clean shapes, XLA otherwise."""
    B, Tq, H, D = q.shape
    S = k.shape[1]
    if use_pallas is None:
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        use_pallas = (
            on_tpu and bias is None and D % 8 == 0 and S % 8 == 0 and Tq >= 8
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
            q, k, v, key_padding_mask, scale, causal=causal, window=window
        )
    scale = D**-0.5 if scale is None else scale
    if bias is None and key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0)[:, None, None, :]
    return reference_attention(
        q * scale, k, v, bias, causal=causal, window=window
    )
