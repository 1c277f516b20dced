"""Counter-based elementwise dropout with a scalar-only VJP residual.

``flax.linen.Dropout`` draws a bernoulli mask from the PRNG and XLA
saves that mask for the backward pass — at the long-source train shape
(B=2 × T_src=4000) the saved (B, T, 4·D) activation-dropout masks plus
their HBM round-trips cost ~1 ms/step of pure bandwidth (round-5
ablation, scripts_dev/train_attn_probe.py). Here the keep decision for
element i is a pure integer hash of (i, seed) — the same counter-based
trick the fused attention kernel uses (ops/attention.py dropout_keep) —
so the backward RECOMPUTES the mask from the scalar seed instead of
loading it: the custom-VJP residual is one uint32.

Regularization-grade randomness only (one avalanche round over an
odd-multiplier injection); the statistical gates live in
tests/test_attention.py / tests/test_models.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm_s2ut.ops.attention import _H1, _H3, _mix


def _keep_mask(shape, seed, rate: float) -> jnp.ndarray:
    n = math.prod(shape)
    idx = jax.lax.iota(jnp.uint32, n)
    h = _mix(idx * _H3 ^ (seed * _H1))
    u = (h >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    keep = _keep_mask(x.shape, seed, rate)
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), 0.0).astype(x.dtype)


def _hd_fwd(x, seed, rate):
    return hash_dropout(x, seed, rate), seed


def _hd_bwd(rate, seed, g):
    keep = _keep_mask(g.shape, seed, rate)
    return (
        jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0).astype(g.dtype),
        None,
    )


hash_dropout.defvjp(_hd_fwd, _hd_bwd)


class HashDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` on the training hot path:
    same call convention (uses the "dropout" rng stream per call, so
    layers/steps stay decorrelated), different — but equally valid —
    mask stream."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        seed = jax.random.bits(self.make_rng("dropout"), (), jnp.uint32)
        return hash_dropout(x, seed, self.rate)
