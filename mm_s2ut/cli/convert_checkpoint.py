"""``python -m mm_s2ut.cli.convert_checkpoint`` — fairseq ``.pt`` → framework
checkpoint dir.

Bridges the reference's trained artifacts into this framework: the
reference loads its flagship checkpoints and fairseq-format mHuBERT with
fairseq ``checkpoint_utils`` (reference models/mm_s2s_transformer.py:229,
228-244); here the same files are converted once into an orbax save dir
that every CLI (`mm_s2ut.inference`, `cli.generate`, `cli.train
--resume`) consumes directly.

  # flagship model (needs the run yaml describing the architecture)
  python -m mm_s2ut.cli.convert_checkpoint --kind mm_s2ut \\
      --fairseq-ckpt checkpoint_best.pt --config run.yaml --out ckpt/

  # fairseq-format mHuBERT → component checkpoint (speech_encoder)
  python -m mm_s2ut.cli.convert_checkpoint --kind hubert \\
      --fairseq-ckpt mhubert_base.pt --out mhubert_ckpt/

(CodeHiFiGAN vocoder checkpoints need no conversion: ``cli.vocode
--vocoder`` reads the fairseq ``.pt`` directly.)
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger("mm_s2ut.convert_checkpoint")


def _save(out_dir: Path, variables, cfg=None, extra_meta: Optional[dict] = None):
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import orbax.checkpoint as ocp

    out_dir.mkdir(parents=True, exist_ok=True)
    variables = jtu.tree_map(jnp.asarray, variables)
    mgr = ocp.CheckpointManager(out_dir.absolute())
    mgr.save(
        0,
        args=ocp.args.StandardSave(
            {"params": variables, "step": jnp.zeros((), jnp.int32)}
        ),
    )
    mgr.wait_until_finished()
    if cfg is not None:
        from mm_s2ut.config import save_yaml

        save_yaml(cfg, out_dir / "config.yaml")
    logger.info("wrote converted checkpoint to %s", out_dir)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.convert_checkpoint")
    ap.add_argument("--kind", choices=("mm_s2ut", "hubert"), required=True)
    ap.add_argument("--fairseq-ckpt", required=True, help="torch .pt checkpoint")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument(
        "--config",
        help="run yaml (mm_s2ut kind: describes the architecture; saved "
        "beside the checkpoint so the inference CLIs are self-contained)",
    )
    ap.add_argument(
        "--component", default="speech_encoder",
        help="hubert kind: subtree name the encoder params are nested "
        "under (for utils.checkpoint.load_component)",
    )
    ap.add_argument(
        "--no-strict", action="store_true",
        help="warn instead of failing on unmapped fairseq keys",
    )
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    out_dir = Path(args.out)
    if args.kind == "mm_s2ut":
        import numpy as np

        import jax
        import jax.numpy as jnp

        from mm_s2ut.config import load_config
        from mm_s2ut.models.mm_s2ut import MMS2UTModel
        from mm_s2ut.utils.fairseq_convert import convert_mm_s2ut_checkpoint

        if not args.config:
            ap.error("--kind mm_s2ut requires --config (architecture yaml)")
        cfg = load_config(args.config)
        variables = convert_mm_s2ut_checkpoint(
            args.fairseq_ckpt, strict=not args.no_strict
        )
        # Shape-check against a fresh init so mismatched yamls fail here,
        # not at first decode.
        model = MMS2UTModel(cfg.model)
        feats = jnp.zeros((1, 8, cfg.data.num_mel_bins), jnp.float32)
        imgs = tuple(
            jnp.zeros((1, 4, d), jnp.float32)
            for d in (cfg.model.multimodal.image_feat_dim or [])
        )
        masks = tuple(jnp.zeros((1, 4), bool) for _ in imgs)
        ref = model.init(
            jax.random.PRNGKey(0), feats, jnp.full((1,), 8, jnp.int32),
            jnp.zeros((1, 2), jnp.int32), imgs_list=imgs,
            img_masks_list=masks, deterministic=True,
        )
        ref_shapes = jax.tree_util.tree_map(np.shape, ref)
        got_shapes = jax.tree_util.tree_map(np.shape, variables)
        if ref_shapes != got_shapes:
            raise ValueError(
                "converted params do not match the architecture in "
                f"{args.config}; check model dims/layer counts"
            )
        _save(out_dir, variables, cfg=cfg)
    else:
        from mm_s2ut.utils.fairseq_convert import convert_fairseq_hubert

        w2v_cfg, variables = convert_fairseq_hubert(args.fairseq_ckpt)
        nested = {"params": {args.component: variables["params"]}}
        _save(out_dir, nested)
        logger.info(
            "hubert config: hidden=%d layers=%d heads=%d (set these in the "
            "run yaml's wav2vec2 section)",
            w2v_cfg.hidden_size, w2v_cfg.num_hidden_layers,
            w2v_cfg.num_attention_heads,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
