"""``python -m mm_s2ut.cli.train`` — training entry point.

Replaces ``fairseq-train --user-dir mm_s2ut ...`` (SURVEY.md L6; reference
scripts/textless/1_train.sh:105-125): one yaml config (plus dotted
overrides) drives task → data → model → jitted sharded training with
checkpoints, metrics, and periodic validation.

Example:
  python -m mm_s2ut.cli.train --config run.yaml \
      train.max_update=40000 train.save_dir=checkpoints/run1
"""
from __future__ import annotations

import argparse
import logging
from typing import List, Optional

logger = logging.getLogger("mm_s2ut.train")


def apply_overrides(cfg, overrides: List[str]) -> None:
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key.path=value")
        path, raw = ov.split("=", 1)
        obj = cfg
        parts = path.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        current = getattr(obj, parts[-1])
        if isinstance(current, bool):
            value = raw.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            value = int(raw)
        elif isinstance(current, float):
            value = float(raw)
        elif isinstance(current, list):
            value = [v for v in raw.split(",") if v]
        else:
            value = raw
        setattr(obj, parts[-1], value)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m mm_s2ut.cli.train")
    ap.add_argument("--config", required=True, help="framework config yaml")
    ap.add_argument("--valid-subset", default="valid")
    ap.add_argument("--train-subset", default="train")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in save_dir")
    ap.add_argument("--load-pretrained-encoder-from", default=None,
                    help="checkpoint dir to initialize the encoder from "
                         "(component-wise load, fairseq "
                         "--load-pretrained-encoder-from parity)")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args(argv)

    from mm_s2ut import registry
    from mm_s2ut.config import load_config
    from mm_s2ut.train.metrics import MetricsWriter

    cfg = load_config(args.config)
    apply_overrides(cfg, args.overrides)
    task = registry.get_task(cfg.task)(cfg)
    trainer = task.build_trainer()
    if args.load_pretrained_encoder_from:
        from mm_s2ut.utils.checkpoint import load_component

        params = load_component(
            trainer.state.params, args.load_pretrained_encoder_from, "encoder"
        )
        trainer.state = trainer.state.replace(params=params)
    if args.resume:
        try:
            step = trainer.restore_checkpoint()
            logger.info("resumed from step %s", step)
        except FileNotFoundError as e:  # genuinely fresh run
            logger.warning("no checkpoint to resume (%s); starting fresh", e)
        # Any other error (corrupt checkpoint, config/shape mismatch)
        # propagates: silently restarting from step 0 in a save_dir the
        # user asked to resume would discard the run.
    writer = MetricsWriter(f"{cfg.train.save_dir}/logs")
    if cfg.train.eval_inference:
        trainer.inference_metrics_fn = task.build_inference_metrics_fn(trainer)
        logger.info("eval_inference on: reporting MCD metrics at validation")

    has_valid = True
    try:
        task.load_dataset(args.valid_subset)
    except FileNotFoundError:
        has_valid = False
        logger.warning("no %s split — skipping validation", args.valid_subset)

    trainer.fit(
        lambda epoch: task.batch_iterator(args.train_subset, epoch),
        (lambda: task.batch_iterator(args.valid_subset, shuffle=False)) if has_valid else None,
        metrics_writer=writer,
    )
    logger.info("done at step %d; checkpoints in %s", int(trainer.state.step), cfg.train.save_dir)
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
