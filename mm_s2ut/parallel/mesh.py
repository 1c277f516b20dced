"""Device mesh + sharding helpers.

TPU-native replacement for the reference's torch.distributed/NCCL DDP
(reference scripts/textless/1_train.sh:106, README.md:145; SURVEY.md §5.8):
a named `jax.sharding.Mesh` with a ``data`` axis (DP — the parity
requirement) and a ``model`` axis (TP — attention heads / FFN sharded
Megatron-style). Gradient reduction is implicit in jit-compiled ``psum``
over ICI; no NCCL, no process groups.

Multi-host: call :func:`init_distributed` before :func:`make_mesh`.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def init_distributed(**kwargs) -> None:
    """Multi-host init (replaces torch.distributed.init_process_group)."""
    jax.distributed.initialize(**kwargs)


def make_mesh(
    data: int = -1,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a (data, pipe, model) mesh over the available devices.

    ``data=-1`` ⇒ use all remaining devices on the data axis. The model
    axis is laid out innermost so TP collectives ride the fastest ICI
    links; the pipe axis sits between (stage hops are one microbatch of
    activations — far lighter traffic than TP's per-layer collectives).
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if model <= 0:
        model = 1
    if pipe <= 0:
        pipe = 1
    if data == -1:
        if n % (model * pipe):
            raise ValueError(
                f"{n} devices not divisible by model={model} x pipe={pipe}")
        data = n // (model * pipe)
    if data * pipe * model != n:
        devs = devs[: data * pipe * model]
    return Mesh(devs.reshape(data, pipe, model), (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch pytree with batch-dim sharding.

    Leaves whose leading dim doesn't divide the data axis (e.g. a ragged
    final batch) are replicated instead — correctness over placement.
    """
    n_data = mesh.shape[DATA_AXIS]

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)


# ---------------------------------------------------------------------------
# Parameter partitioning (TP). Rules keyed on parameter path; default is
# replicated (pure DP — reference parity). With mesh.model > 1, attention
# QKV/out and FFN weights shard Megatron-style.
# ---------------------------------------------------------------------------

# (regex on 'path/like/this', PartitionSpec) — first match wins.
_TP_RULES = [
    # Attention: q/k/v project col-parallel, out row-parallel.
    (re.compile(r".*(q_proj|k_proj|v_proj)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*(q_proj|k_proj|v_proj)/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*out_proj/kernel$"), P(MODEL_AXIS, None)),
    # FFN: fc1 col-parallel, fc2 row-parallel.
    (re.compile(r".*fc1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*fc1/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*fc2/kernel$"), P(MODEL_AXIS, None)),
    # Embedding / output projection: shard the vocab dim.
    (re.compile(r".*embed_tokens/embedding$"), P(MODEL_AXIS, None)),
]


def _spec_for(path: str, ndim: int, tp: bool, pp: bool) -> P:
    # Pipelined stacks (parallel/pipeline.py) store per-layer params
    # stacked on a leading L axis under `pipe_stack/layers`: shard stages
    # over the pipe axis, then apply the TP rules to the per-layer dims.
    if pp and "pipe_stack/layers" in path:
        if tp:
            for rx, spec in _TP_RULES:
                if rx.match(path) and len([s for s in spec if s is not None]) < ndim:
                    return P(PIPE_AXIS, *spec)
        return P(PIPE_AXIS)
    if tp:
        for rx, spec in _TP_RULES:
            if rx.match(path) and len([s for s in spec if s is not None]) <= ndim:
                return spec
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for a param pytree (flax FrozenDict or dict)."""
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    pp = mesh.shape.get(PIPE_AXIS, 1) > 1
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for keypath, leaf in flat:
        path = "/".join(_key_str(k) for k in keypath)
        shardings.append(
            NamedSharding(mesh, _spec_for(path, np.ndim(leaf), tp, pp)))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def maybe_shard(x, *spec) -> Any:
    """Apply a sharding constraint when a mesh context is active
    (``jax.set_mesh``); a no-op otherwise. Used for opt-in sequence
    parallelism: annotate activations as P(data, model, None) so XLA
    shards the sequence dim over the model axis and inserts the
    collectives (Megatron-SP style)."""
    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except Exception:
        return x


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)
