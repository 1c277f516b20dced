"""GPipe pipeline parallelism over a named ``pipe`` mesh axis.

Beyond-reference scaling capability (the reference is DP-only — SURVEY.md
§2.3; §5.7/§7-B1 ask this rebuild to expose the mesh so further axes can
be added without restructuring). TPU-native design:

* Stages live on a ``pipe`` mesh axis: each device holds ``L/S``
  contiguous transformer layers, parameters stored **stacked** (leading
  layer axis) and sharded ``P("pipe", ...)`` so stage weights never move.
* Microbatches stream through the stage ring with ``lax.ppermute`` —
  each hop is one ICI transfer of a single microbatch's activations.
* The whole GPipe schedule is a ``lax.scan`` inside the jitted train
  step, entered through a **partial-manual** ``jax.shard_map`` that is
  manual over ``pipe`` only: the ``data``/``model`` axes stay under the
  outer jit's automatic partitioner, so DP batch sharding and Megatron
  TP inside each layer compose with PP with no extra plumbing.
* Reverse-mode AD differentiates through ``ppermute``/``scan``, so the
  backward pipeline (transposed schedule, reverse ICI hops) is derived
  by the compiler — no hand-written backward pass.

Identity contract (tested): with the same stacked params, ``gpipe`` is
bitwise-equal to running the layers sequentially on one device — every
layer executes on exactly one device with identical math; only the
output psum-broadcast adds zeros.

Checkpoint compatibility: :func:`stack_layer_params` /
:func:`unstack_layer_params` convert between the sequential encoder's
``layer{i}/...`` parameter tree and the stacked ``pipe_stack/layers``
tree, so checkpoints move freely between PP and non-PP topologies
(the Megatron-style repartition-on-load workflow).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from mm_s2ut.parallel.mesh import PIPE_AXIS


def gpipe(
    layer_fn: Callable[[Any, jnp.ndarray, jnp.ndarray, Any, Any], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    extras: Any = (),
    mb_extras: Any = (),
    *,
    n_stages: int,
    n_micro: int,
    axis: str = PIPE_AXIS,
    remat: bool = False,
) -> jnp.ndarray:
    """Run an L-layer stack as an S-stage GPipe over mesh axis ``axis``.

    Args:
      layer_fn: ``(params_one_layer, layer_idx, x_mb, extras_mb,
        mb_extras_mb) -> x_mb`` — one layer on one microbatch.
      stacked_params: pytree whose leaves have leading axis L
        (``L % n_stages == 0``); shard ``P(axis, ...)`` for zero-copy
        stage weights.
      x: ``(B, ...)`` activations, ``B % n_micro == 0``.
      extras: pytree of per-sample side inputs with leading ``B``
        (padding bias/masks); microbatched alongside ``x``.
      mb_extras: pytree of per-*microbatch* side inputs with leading
        ``n_micro`` (e.g. one dropout key per microbatch).
      remat: rematerialize each layer in the backward pass
        (``jax.checkpoint``), bounding pipeline activation memory.

    Returns ``(B, ...)`` outputs, replicated over ``axis``.
    """
    leaves = jax.tree_util.tree_leaves(stacked_params)
    if not leaves:
        raise ValueError("gpipe: empty stacked_params")
    n_layers = leaves[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by {n_micro} microbatches")
    mb = x.shape[0] // n_micro
    xm = x.reshape(n_micro, mb, *x.shape[1:])
    extras_m = jax.tree_util.tree_map(
        lambda a: a.reshape(n_micro, mb, *a.shape[1:]), extras)
    fn = layer_fn if not remat else jax.checkpoint(layer_fn)

    # 16-bit collectives under a partial-manual shard_map crash XLA:CPU's
    # AllReducePromotion pass ("Invalid binary instruction opcode copy").
    # Every all-reduce at the pipe boundary — the output broadcast AND the
    # backward-pass transpose of the replicated inputs (psum of their
    # cotangents over `pipe`) — must therefore be f32. Cast 16-bit leaves
    # to f32 at the boundary and back inside: lossless for values that
    # were 16-bit, and a per-call (not per-layer) cost.
    _is16 = lambda a: jnp.issubdtype(a.dtype, jnp.inexact) and a.dtype.itemsize < 4
    _widen = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if _is16(a) else a, t)
    xm_dtype = xm.dtype
    extras_dtypes = jax.tree_util.tree_map(lambda a: a.dtype, extras_m)

    def per_device(params_local, xm_w, extras_w, mb_extras):
        # pcast-to-varying FIRST (while still f32), then narrow: the
        # backward transpose of the invariant→varying conversion is a
        # psum over `pipe` of the cotangent, and it must be f32 too.
        _mk_varying = lambda a: jax.lax.pcast(a, (axis,), to="varying")
        xm = _mk_varying(xm_w).astype(xm_dtype)
        extras_m = jax.tree_util.tree_map(
            lambda a, d: _mk_varying(a).astype(d), extras_w, extras_dtypes)
        s = jax.lax.axis_index(axis)
        l_per_stage = n_layers // n_stages
        layer_ids = s * l_per_stage + jnp.arange(l_per_stage)

        def tick(carry, t):
            recv, outs = carry
            # Stage 0 ingests microbatch t (clamped past the drain phase —
            # those ticks' outputs are never written); stage s>0 consumes
            # what stage s-1 ppermuted to it last tick.
            x_in = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), keepdims=False)
            h = jnp.where(s == 0, x_in, recv)
            # The microbatch resident at stage s on tick t is mb_id = t - s.
            mb_here = jnp.clip(t - s, 0, n_micro - 1)
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, mb_here, keepdims=False)
            e_mb = jax.tree_util.tree_map(take, extras_m)
            m_mb = jax.tree_util.tree_map(take, mb_extras)

            def body(h, pl):
                p, li = pl
                return fn(p, li, h, e_mb, m_mb), None

            h, _ = jax.lax.scan(body, h, (params_local, layer_ids))
            # Last stage commits microbatch t-(S-1) once it exists.
            mb_out = t - (n_stages - 1)
            valid = (s == n_stages - 1) & (mb_out >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, h, jnp.clip(mb_out, 0, n_micro - 1), 0)
            outs = jnp.where(valid, upd, outs)
            recv = jax.lax.ppermute(
                h, axis, [(i, i + 1) for i in range(n_stages - 1)])
            return (recv, outs), None

        outs0 = jnp.zeros_like(xm)  # xm is varying post-pcast, so these are too
        recv0 = jnp.zeros_like(xm[0])
        n_ticks = n_micro + n_stages - 1
        (_, outs), _ = jax.lax.scan(tick, (recv0, outs0), jnp.arange(n_ticks))
        # Only the last stage holds real outputs (zeros elsewhere):
        # psum doubles as a broadcast back to every stage. 16-bit
        # all-reduces under a partial-manual shard_map crash XLA:CPU's
        # AllReducePromotion pass ("Invalid binary instruction opcode
        # copy"), so sum in f32 — exact here (zeros + one bf16 value)
        # and a one-shot transfer, not a per-layer collective.
        if jnp.issubdtype(outs.dtype, jnp.inexact) and outs.dtype.itemsize < 4:
            return jax.lax.psum(outs.astype(jnp.float32), axis).astype(outs.dtype)
        return jax.lax.psum(outs, axis)

    out = jax.shard_map(
        per_device,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(),
        axis_names={axis},
    )(stacked_params, _widen(xm), _widen(extras_m), mb_extras)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# layer{i} ↔ stacked checkpoint conversion
# ---------------------------------------------------------------------------


def stack_layer_params(params: dict, prefix: str = "layer") -> Any:
    """``{layer0: t0, layer1: t1, ...}`` → one pytree with leading axis L.

    ``params`` is the parent tree holding the per-layer subtrees (other
    keys are ignored). Layers are ordered by their integer suffix.
    """
    idx = sorted(
        int(k[len(prefix):]) for k in params
        if k.startswith(prefix) and k[len(prefix):].isdigit()
    )
    if idx != list(range(len(idx))) or not idx:
        raise ValueError(f"non-contiguous or missing {prefix}{{i}} keys: {idx}")
    per_layer = [params[f"{prefix}{i}"] for i in idx]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)


def unstack_layer_params(stacked: Any, prefix: str = "layer") -> dict:
    """Inverse of :func:`stack_layer_params`."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda a, i=i: a[i], stacked)
        for i in range(n)
    }


# ---------------------------------------------------------------------------
# Flax wrapper: a pipelined homogeneous encoder stack
# ---------------------------------------------------------------------------


class PipelinedEncoderStack(nn.Module):
    """``num_layers`` homogeneous layers executed as a GPipe.

    Drop-in for the sequential encoder layer loop (same per-layer call
    signature ``(x, padding_bias, deterministic, key_padding_mask)``).
    Parameters are created stacked under ``layers`` (leading axis L) so
    ``param_shardings`` can place stages with ``P("pipe", ...)``.

    Dropout under PP draws from a per-(microbatch, layer) folded stream —
    iid Bernoulli with the right rate, but a different sample than the
    sequential encoder would draw from the same seed (schedule-dependent
    placement makes stream-identity impossible without materializing all
    masks up front).
    """

    layer_factory: Callable[[], nn.Module]
    num_layers: int
    n_stages: int
    n_micro: int = 0  # 0 ⇒ default to n_stages
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_bias: Optional[jnp.ndarray],
        deterministic: bool = True,
        key_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        layer = self.layer_factory()
        n_micro = self.n_micro or self.n_stages

        def init_stacked(rng):
            def one(r):
                return layer.init(
                    r, x[:1], None if padding_bias is None else padding_bias[:1],
                    True,
                    None if key_padding_mask is None else key_padding_mask[:1],
                )["params"]

            return jax.vmap(one)(jax.random.split(rng, self.num_layers))

        stacked = self.param("layers", init_stacked)

        extras = {}
        if padding_bias is not None:
            extras["bias"] = padding_bias
        if key_padding_mask is not None:
            extras["kpm"] = key_padding_mask
        mb_extras = {}
        if not deterministic:
            base = self.make_rng("dropout")
            mb_extras["rng"] = jax.random.split(base, n_micro)

        def layer_fn(p, layer_idx, h, e, m):
            rngs = None
            if "rng" in m:
                rngs = {"dropout": jax.random.fold_in(m["rng"], layer_idx)}
            return layer.apply(
                {"params": p},
                h,
                e.get("bias"),
                deterministic,
                e.get("kpm"),
                rngs=rngs,
            )

        return gpipe(
            layer_fn, stacked, x, extras, mb_extras,
            n_stages=self.n_stages, n_micro=n_micro, remat=self.remat,
        )
