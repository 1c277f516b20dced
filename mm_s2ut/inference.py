"""``python -m mm_s2ut.inference`` — single-sample and batch S2ST inference.

The reference documents this CLI (README.md:203-214) but never shipped it
(SURVEY.md §2.1 gap); here it exists for real, with the documented flags:

  python -m mm_s2ut.inference --model_path CKPT --audio_path a.wav \
      --image_path img.jpg --output_dir out/            # single sample
  python -m mm_s2ut.inference --model_path CKPT \
      --manifest_file test.tsv --output_dir out/        # batch

``--model_path`` is a framework checkpoint directory (orbax save dir with
config.yaml, as written by the Trainer). Images may be precomputed
feature ``.npy`` files or raw images (requires ``--vit_checkpoint``).
With ``--vocoder_path``/``--vocoder_cfg`` the units are vocoded to wavs
on device; otherwise ``.unit`` files are emitted (same artifact the
reference's 3_generate_waveform.sh consumes).
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

import numpy as np

import mm_s2ut.cli  # noqa: F401  (compile cache + MM_S2UT_FORCE_CPU setup)

logger = logging.getLogger("mm_s2ut.inference")


def load_checkpoint(model_path: str):
    """Restore (config, model, params) from a Trainer save dir."""
    import jax
    import orbax.checkpoint as ocp

    from mm_s2ut.config import load_config
    from mm_s2ut.models import build_model_from_config

    path = Path(model_path).absolute()
    cfg_file = path / "config.yaml"
    if not cfg_file.exists():
        raise FileNotFoundError(
            f"{cfg_file} not found — pass a Trainer checkpoint directory"
        )
    cfg = load_config(cfg_file)
    model = build_model_from_config(cfg)

    mgr = ocp.CheckpointManager(path)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {path}")
    restored = mgr.restore(step)
    params = restored["params"] if "params" in restored else restored
    if "params" not in params:
        params = {"params": params}
    logger.info("restored step %d from %s", step, path)
    return cfg, model, params


def load_image_features(
    image_path: str,
    vit_checkpoint: Optional[str],
    image_feat_dim: int,
) -> np.ndarray:
    """(1, T_img, D) features from a .npy blob or a raw image via ViT."""
    if image_path.endswith((".npy", ".npz")):
        feats = np.load(image_path)
        if hasattr(feats, "keys"):
            feats = feats[list(feats.keys())[0]]
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 2:
            return feats[None]
        if feats.ndim == 3 and feats.shape[0] == 1:
            return feats
        raise ValueError(
            f"{image_path} holds {feats.shape[0]} images — single-sample "
            "inference needs one (T_img, D) feature array; slice the split "
            "blob first (np.save(out, blob[i]))"
        )
    if vit_checkpoint is None:
        raise ValueError(
            "raw image input requires --vit_checkpoint (timm pytorch_model.bin)"
        )
    import jax.numpy as jnp
    from PIL import Image

    from mm_s2ut.models.vit import (
        VIT_VARIANTS,
        VisionTransformer,
        load_timm_checkpoint,
        preprocess_images,
    )

    name = "vit_base_patch16_384" if image_feat_dim == 768 else None
    for variant, cfg in VIT_VARIANTS.items():
        if cfg.embed_dim == image_feat_dim:
            name = variant
    vit_cfg = VIT_VARIANTS[name]
    variables = load_timm_checkpoint(vit_checkpoint, vit_cfg)
    vit = VisionTransformer(vit_cfg)
    pixels = preprocess_images([Image.open(image_path)], vit_cfg.image_size)
    feats, _ = vit.apply(variables, jnp.asarray(pixels))
    return np.asarray(feats)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m mm_s2ut.inference",
        description="Multimodal S2UT inference (speech+image → units → wav)",
    )
    ap.add_argument("--model_path", required=True, help="Trainer checkpoint dir")
    ap.add_argument("--audio_path", help="single-sample source wav")
    ap.add_argument("--image_path", help="image (.jpg/.png) or features (.npy)")
    ap.add_argument("--manifest_file", help="batch mode: TSV manifest")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--beam", type=int, default=None)
    ap.add_argument("--vit_checkpoint", help="timm ViT weights for raw images")
    ap.add_argument("--vocoder_path", help="CodeHiFiGAN checkpoint (.pt)")
    ap.add_argument("--vocoder_cfg", help="CodeHiFiGAN config.json")
    ap.add_argument("--gen_subset", default="test", help="batch output naming")
    ap.add_argument(
        "--continuous-batching", action="store_true",
        help="batch mode: continuous-batching decode (slot pool refilled "
        "as utterances finish; results identical to static batching)",
    )
    ap.add_argument("--slots", type=int, default=8,
                    help="continuous-batching slot count")
    ap.add_argument("--admit-width", type=int, default=None,
                    help="continuous-batching admission-wave width (rows "
                         "encoded/transferred per refill; default: slots)")
    ap.add_argument("--aot", default=None, metavar="DIR",
                    help="load serialized generate executables saved by "
                         "`cli.warmup --aot DIR` (zero tracing/compile for "
                         "matching batch shapes; others fall back to jit)")
    args = ap.parse_args(argv)

    if not args.audio_path and not args.manifest_file:
        ap.error("one of --audio_path / --manifest_file is required")

    import jax.numpy as jnp

    from mm_s2ut.config import GenerationConfig
    from mm_s2ut.data.audio_io import get_waveform, write_wav
    from mm_s2ut.data.dictionary import UnitDictionary
    from mm_s2ut.infer.generator import UnitGenerator, format_generation_output
    from mm_s2ut.tasks.s2s_task import waveform_frontend
    from mm_s2ut.ops.fbank import FbankConfig

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg, model, params = load_checkpoint(args.model_path)
    if args.beam:
        cfg.generation.beam = args.beam
    tgt_dict = UnitDictionary(cfg.data.target_code_size)
    gen = UnitGenerator(model, params, cfg.generation,
                        max_target_positions=cfg.model.max_target_positions)
    if args.aot:
        n = gen.aot_load(args.aot)
        logger.info("AOT: loaded %d operating point(s) from %s", n, args.aot)
    fbank_cfg = FbankConfig(
        sample_rate=cfg.data.sample_rate, num_mel_bins=cfg.data.num_mel_bins
    )

    def decode_batch(wavs: List[np.ndarray], imgs: Optional[np.ndarray]):
        S = max(len(w) for w in wavs)
        batch = np.zeros((len(wavs), S), np.float32)
        lens = np.zeros((len(wavs),), np.int32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
            lens[i] = len(w)
        feats, frame_lens = waveform_frontend(
            jnp.asarray(batch), jnp.asarray(lens), fbank_cfg,
            cfg.data.standardize_audio,
        )
        imgs_list = (imgs,) if imgs is not None else ()
        masks = (np.zeros(imgs.shape[:2], bool),) if imgs is not None else ()
        return gen.generate(np.asarray(feats), np.asarray(frame_lens), imgs_list, masks)

    # ---- gather inputs ----
    if args.audio_path:
        wav, _ = get_waveform(args.audio_path, use_sample_rate=cfg.data.sample_rate)
        imgs = None
        if args.image_path:
            imgs = load_image_features(
                args.image_path, args.vit_checkpoint,
                cfg.model.multimodal.image_feat_dim[0] if cfg.model.multimodal.image_feat_dim else 768,
            )
        hypos = decode_batch([wav.astype(np.float32)], imgs)
        names = [Path(args.audio_path).stem]
        sample_ids = [0]
        targets = None
    else:
        from mm_s2ut.data.manifest import read_manifest

        rows = read_manifest(args.manifest_file)
        wavs, names, sample_ids, targets = [], [], [], []
        for i, row in enumerate(rows):
            path = row.src_audio
            if cfg.data.audio_root and not Path(path).is_absolute():
                path = str(Path(cfg.data.audio_root) / path)
            wavs.append(get_waveform(path, use_sample_rate=cfg.data.sample_rate)[0].astype(np.float32))
            names.append(Path(row.src_audio).stem)
            sample_ids.append(i)
            targets.append(tgt_dict.encode_line(row.tgt_text, append_eos=False).tolist())
        if args.continuous_batching:
            import jax

            from mm_s2ut.infer.serving import ContinuousServer, Request

            g = cfg.generation
            enc_frames = max(
                int(np.ceil(max(len(w) for w in wavs) / fbank_cfg.frame_shift)) + 8,
                64,
            )
            # Ring sized to the worst-case per-slot budget a·src_T + b
            # (src_T = encoder positions after 4× conv subsampling); slots
            # with longer nominal budgets are clamped to ring-2 at admit.
            max_len_cap = min(
                int(g.max_len_a * (enc_frames // 4) + g.max_len_b) + 2,
                cfg.model.max_target_positions - 1,
            )
            srv = ContinuousServer(
                model, params, slots=args.slots, beam_size=g.beam,
                ring=int(2 ** np.ceil(np.log2(max(max_len_cap, g.max_len_b + 2)))),
                enc_frames=enc_frames,
                vocab_size=cfg.model.vocab_size,
                len_penalty=g.len_penalty,
                max_len_a=g.max_len_a, max_len_b=g.max_len_b,
                kv_cache_dtype=g.kv_cache_dtype,
                admit_width=args.admit_width,
            )
            reqs = []
            for i, w in enumerate(wavs):
                feats, flens = waveform_frontend(
                    jnp.asarray(w[None]), jnp.asarray([len(w)], np.int32),
                    fbank_cfg, cfg.data.standardize_audio,
                )
                reqs.append(Request(
                    uid=i, features=np.asarray(feats[0]), length=int(flens[0])
                ))
            by_uid = {r.uid: r for r in srv.run(reqs)}
            hypos = [
                [{"tokens": by_uid[i].tokens, "score": by_uid[i].score}]
                for i in range(len(wavs))
            ]
        else:
            hypos = []
            B = 8
            for i in range(0, len(wavs), B):
                hypos.extend(decode_batch(wavs[i : i + B], None))

    # ---- emit units (+ fairseq-format txt) ----
    unit_lines = []
    for name, hyp in zip(names, hypos):
        units = tgt_dict.ids_to_units(np.asarray(hyp[0]["tokens"], np.int64))
        unit_lines.append(" ".join(str(u) for u in units))
        (out_dir / f"{name}.unit").write_text(unit_lines[-1] + "\n")
    gen_txt = out_dir / f"generate-{args.gen_subset}.txt"
    gen_txt.write_text(
        "\n".join(format_generation_output(sample_ids, hypos, tgt_dict, targets)) + "\n"
    )
    logger.info("wrote %d .unit files + %s", len(names), gen_txt)

    # ---- optional vocoding ----
    if args.vocoder_path:
        from mm_s2ut.models.hifigan import (
            CodeHiFiGAN,
            HiFiGANConfig,
            load_fairseq_checkpoint,
        )

        vcfg = (
            HiFiGANConfig.from_json(args.vocoder_cfg)
            if args.vocoder_cfg else HiFiGANConfig()
        )
        variables = load_fairseq_checkpoint(args.vocoder_path, vcfg)
        max_units = max(
            (len(l.split()) for l in unit_lines if l.strip()), default=1
        )
        voc = CodeHiFiGAN(vcfg, max_frames=4 * max_units + 8)
        for name, line in zip(names, unit_lines):
            units = np.asarray([int(u) for u in line.split()], np.int32)
            if units.size == 0:
                # Empty hypothesis → short silence (keeps the wav-per-line
                # contract of the downstream ASR/BLEU chain).
                write_wav(out_dir / f"{name}_pred.wav", np.zeros(1600, np.float32), 16000)
                continue
            wav, n = voc.apply(
                variables, units[None], jnp.asarray([len(units)])
            )
            n = int(np.asarray(n)[0])
            write_wav(out_dir / f"{name}_pred.wav", np.asarray(wav)[0, :n], 16000)
        logger.info("vocoded %d wavs", len(names))
    return 0


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    raise SystemExit(main())
