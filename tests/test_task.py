"""End-to-end task test: TSV corpus → device fbank → train steps → beam
decode — the minimum vertical slice (SURVEY.md §7)."""
import pytest

pytestmark = pytest.mark.slow
import numpy as np
import pytest

import mm_s2ut  # noqa: F401
from mm_s2ut import registry
from mm_s2ut.config import Config, DataConfig, ModelConfig, MultimodalConfig, TrainConfig
from mm_s2ut.data.audio_io import write_wav
from mm_s2ut.data.manifest import ManifestRow, write_manifest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("corpus")
    sr = 16000
    rng = np.random.RandomState(0)
    n = 8
    rows = []
    feat_dir = tmp_path / "img_feat"
    feat_dir.mkdir()
    np.save(feat_dir / "train.npy", rng.randn(n, 6, 16).astype(np.float32))
    np.save(feat_dir / "valid.npy", rng.randn(n, 6, 16).astype(np.float32))
    for i in range(n):
        length = sr // 4 + (i % 3) * sr // 8
        wav = (0.3 * rng.randn(length)).astype(np.float32)
        write_wav(tmp_path / f"{i + 1}.wav", wav, sr)
        units = " ".join(str(u) for u in rng.randint(0, 50, 8 + i % 4))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, units, 8 + i % 4))
    write_manifest(tmp_path / "train.tsv", rows)
    write_manifest(tmp_path / "valid.tsv", rows[:4])
    return tmp_path


def make_cfg(corpus):
    return Config(
        model=ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, conv_channels=16, dtype="float32",
            multimodal=MultimodalConfig(
                image_feat_path=[str(corpus / "img_feat")],
                image_feat_dim=[16],
                multimodal_attention_type="selective_attention",
            ),
        ),
        data=DataConfig(
            data_root=str(corpus), audio_root=str(corpus),
            target_code_size=50, max_tokens=400, num_buckets=2,
        ),
        train=TrainConfig(update_freq=1, warmup_updates=5, lr=1e-3, seed=3),
        mesh=__import__("mm_s2ut.config", fromlist=["MeshConfig"]).MeshConfig(data=1),
    )


def test_task_registered():
    assert "multimodal_speech_to_speech" in registry.available("task")


def test_task_end_to_end(corpus):
    TaskCls = registry.get_task("multimodal_speech_to_speech")
    task = TaskCls(make_cfg(corpus))
    assert len(task.tgt_dict) == 54  # 4 specials + 50 units

    batches = list(task.batch_iterator("train", epoch=0))
    assert batches
    b = batches[0]
    assert b["src_features"].ndim == 3 and b["src_features"].shape[-1] == 80
    assert b["imgs_list"][0].shape[-1] == 16

    trainer = task.build_trainer()
    seen = 0
    for epoch in range(2):
        for batch in task.batch_iterator("train", epoch=epoch):
            m = trainer.train_batch(batch)
            seen += 1
    assert seen >= 4
    ev = trainer.evaluate(task.batch_iterator("valid", shuffle=False))
    assert np.isfinite(ev["loss"])

    # Greedy/beam decode through the generator on one batch.
    from mm_s2ut.config import GenerationConfig
    from mm_s2ut.infer.generator import UnitGenerator, format_generation_output

    gen = UnitGenerator(
        trainer.model, trainer.state.params,
        GenerationConfig(beam=2, max_len_a=0, max_len_b=12),
    )
    hyps = gen.generate(
        np.asarray(b["src_features"]), np.asarray(b["src_lengths"]),
        tuple(np.asarray(x) for x in b["imgs_list"]),
        tuple(np.asarray(x) for x in b["img_masks_list"]),
    )
    assert len(hyps) == b["src_features"].shape[0]
    lines = format_generation_output(
        b["id"].tolist(), hyps, task.tgt_dict,
        targets=[t[t != 1].tolist() for t in np.asarray(b["target"])],
    )
    assert any(l.startswith("D-") for l in lines)
    assert any(l.startswith("T-") for l in lines)


def test_eval_inference_mcd_metrics(corpus, tmp_path):
    """train.eval_inference: validation reports MCD stats through the
    generator + vocoder chain (fairseq --eval-inference surface; reference
    criterion reduce, speech_to_speech_criterion.py:105-117)."""
    import json
    import sys

    import torch

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_hifigan import SMALL, _torch_generator

    torch.manual_seed(0)
    tgen = _torch_generator(SMALL)
    sd = dict(tgen.state_dict())
    # 50 units to match the corpus target_code_size.
    sd["dict.weight"] = torch.randn(50, SMALL.embedding_dim)
    torch.save(sd, tmp_path / "vocoder.pt")
    vcfg = {k: getattr(SMALL, k) for k in (
        "embedding_dim", "model_in_dim", "upsample_initial_channel",
    )}
    vcfg.update(
        num_embeddings=50,
        upsample_rates=list(SMALL.upsample_rates),
        upsample_kernel_sizes=list(SMALL.upsample_kernel_sizes),
        resblock_kernel_sizes=list(SMALL.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in SMALL.resblock_dilation_sizes],
        dur_prediction=False,
    )
    (tmp_path / "vocoder.json").write_text(json.dumps(vcfg))

    cfg = make_cfg(corpus)
    cfg.train.eval_inference = True
    cfg.train.eval_vocoder_path = str(tmp_path / "vocoder.pt")
    cfg.train.eval_vocoder_cfg = str(tmp_path / "vocoder.json")
    cfg.generation.beam = 1
    cfg.generation.max_len_a = 0
    cfg.generation.max_len_b = 8
    TaskCls = registry.get_task("multimodal_speech_to_speech")
    task = TaskCls(cfg)
    trainer = task.build_trainer()
    fn = task.build_inference_metrics_fn(trainer)
    ev = trainer.evaluate(task.batch_iterator("valid", shuffle=False), fn)
    for key in ("mcd_loss", "pred_ratio", "ins_rate", "del_rate"):
        assert key in ev and np.isfinite(ev[key]), (key, ev)
    assert ev["mcd_loss"] > 0


def test_online_visual_extractor_train_from_jpgs(tmp_path):
    """Config-driven raw-image train path (reference
    models/mm_s2s_transformer.py:272-306 + dataset :168-190,318-330):
    jpgs + flickr30k layout + load_visual_extractor_type, no precomputed
    features anywhere — the dataset yields preprocessed pixels, the
    encoder runs a tiny in-graph ViT, and a train step optimizes through
    it."""
    from PIL import Image

    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.manifest import ManifestRow, write_manifest

    sr = 16000
    rng = np.random.RandomState(0)
    n = 4
    # flickr30k layout: {root}/flickr30k-images/*.jpg + train.txt list.
    img_dir = tmp_path / "flickr30k-images"
    img_dir.mkdir()
    names = []
    for i in range(n):
        name = f"img{i}.jpg"
        arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        names.append(name)
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    rows = []
    for i in range(n):
        length = sr // 4
        write_wav(tmp_path / f"{i + 1}.wav", (0.3 * rng.randn(length)).astype(np.float32), sr)
        units = " ".join(str(u) for u in rng.randint(0, 50, 8))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, units, 8))
    write_manifest(tmp_path / "train.tsv", rows)

    cfg = Config(
        model=ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, conv_channels=16, dtype="float32",
            multimodal=MultimodalConfig(
                image_feat_dim=[32],
                multimodal_attention_type="selective_attention",
                load_visual_extractor_type="vit_timm",
                flickr30k_root=str(tmp_path),
                image_input_size=32,
                visual_extractor_args={
                    "embed_dim": 32, "depth": 1, "num_heads": 2,
                    "patch_size": 16,
                },
            ),
        ),
        data=DataConfig(
            data_root=str(tmp_path), audio_root=str(tmp_path),
            target_code_size=50, max_tokens=400, num_buckets=1,
        ),
        train=TrainConfig(update_freq=1, warmup_updates=5, lr=1e-3, seed=3),
        mesh=__import__("mm_s2ut.config", fromlist=["MeshConfig"]).MeshConfig(data=1),
    )
    TaskCls = registry.get_task("multimodal_speech_to_speech")
    task = TaskCls(cfg)
    batches = list(task.batch_iterator("train", epoch=0))
    assert batches
    b = batches[0]
    # Raw pixels, not features.
    assert b["imgs_list"][0].ndim == 4 and b["imgs_list"][0].shape[-1] == 3

    trainer = task.build_trainer()
    # The extractor's params exist and receive gradients through fusion.
    import jax as _jax

    assert "visual_extractor" in trainer.state.params["params"]

    def first_leaf():
        return np.asarray(_jax.device_get(_jax.tree_util.tree_leaves(
            trainer.state.params["params"]["visual_extractor"]
        )[0])).copy()

    before = first_leaf()
    m = trainer.train_batch(b)
    assert np.isfinite(float(_jax.device_get(m["loss"])))
    assert not np.allclose(first_leaf(), before)


def test_load_visual_extractor_pretrained(tmp_path):
    """multimodal.load_visual_extractor names a pretrained timm-format
    checkpoint; build_trainer initializes the in-graph extractor from it
    (reference build_visual_extractor from_pretrained,
    mm_s2s_transformer.py:272-290). A silently-ignored path key is a bug."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.manifest import ManifestRow, write_manifest
    from mm_s2ut.models.vit import ViTConfig, convert_timm_state_dict

    sr = 16000
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "flickr30k-images"
    img_dir.mkdir()
    names = []
    for i in range(2):
        name = f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(img_dir / name)
        names.append(name)
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    rows = []
    for i in range(2):
        length = sr // 4
        write_wav(tmp_path / f"{i + 1}.wav", (0.3 * rng.randn(length)).astype(np.float32), sr)
        units = " ".join(str(u) for u in rng.randint(0, 50, 8))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, units, 8))
    write_manifest(tmp_path / "train.tsv", rows)

    vc = ViTConfig(image_size=32, patch_size=16, embed_dim=32, depth=1, num_heads=2)
    # timm-format torch state dict for that graph.
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    D, H = vc.embed_dim, int(vc.embed_dim * vc.mlp_ratio)
    sd = {
        "cls_token": t(1, 1, D), "pos_embed": t(1, vc.seq_len, D),
        "patch_embed.proj.weight": t(D, 3, 16, 16), "patch_embed.proj.bias": t(D),
        "norm.weight": torch.ones(D), "norm.bias": torch.zeros(D),
        "blocks.0.norm1.weight": torch.ones(D), "blocks.0.norm1.bias": torch.zeros(D),
        "blocks.0.attn.qkv.weight": t(3 * D, D), "blocks.0.attn.qkv.bias": t(3 * D),
        "blocks.0.attn.proj.weight": t(D, D), "blocks.0.attn.proj.bias": t(D),
        "blocks.0.norm2.weight": torch.ones(D), "blocks.0.norm2.bias": torch.zeros(D),
        "blocks.0.mlp.fc1.weight": t(H, D), "blocks.0.mlp.fc1.bias": t(H),
        "blocks.0.mlp.fc2.weight": t(D, H), "blocks.0.mlp.fc2.bias": t(D),
    }
    ckpt = tmp_path / "vit_tiny.pth"
    torch.save(sd, ckpt)

    cfg = Config(
        model=ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, conv_channels=16, dtype="float32",
            multimodal=MultimodalConfig(
                image_feat_dim=[32],
                multimodal_attention_type="selective_attention",
                load_visual_extractor_type="vit_timm",
                load_visual_extractor=str(ckpt),
                flickr30k_root=str(tmp_path),
                image_input_size=32,
                visual_extractor_args={
                    "embed_dim": 32, "depth": 1, "num_heads": 2,
                    "patch_size": 16,
                },
            ),
        ),
        data=DataConfig(
            data_root=str(tmp_path), audio_root=str(tmp_path),
            target_code_size=50, max_tokens=400, num_buckets=1,
        ),
        train=TrainConfig(update_freq=1, warmup_updates=5, lr=1e-3, seed=3),
        mesh=__import__("mm_s2ut.config", fromlist=["MeshConfig"]).MeshConfig(data=1),
    )
    task = registry.get_task("multimodal_speech_to_speech")(cfg)
    trainer = task.build_trainer()
    got = trainer.state.params["params"]["visual_extractor"]
    want = convert_timm_state_dict(
        {k: v.numpy() for k, v in sd.items()}, vc
    )["params"]
    np.testing.assert_allclose(
        np.asarray(got["block0"]["qkv"]["kernel"], np.float32),
        want["block0"]["qkv"]["kernel"], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["cls_token"], np.float32), want["cls_token"], atol=1e-6
    )
    # Mismatched graph → clear error, not silent drop.
    cfg.model.multimodal.visual_extractor_args["embed_dim"] = 24
    with pytest.raises(Exception):
        registry.get_task("multimodal_speech_to_speech")(cfg).build_trainer()
