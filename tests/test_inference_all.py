"""Full eval-loop integration test (SURVEY.md C19/§3.5): trained ckpt →
generate → unit extraction → vocode → wav2vec2-CTC ASR → ASR-BLEU, all
through cli.inference_all with the reference's intermediate artifacts."""
import pytest

pytestmark = pytest.mark.slow
import json
from pathlib import Path

import numpy as np
import pytest

import mm_s2ut  # noqa: F401


@pytest.fixture(scope="module")
def tiny_asr_dir(tmp_path_factory):
    """Random-weight HF Wav2Vec2ForCTC checkpoint dir + vocab.json."""
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC as HFModel

    d = tmp_path_factory.mktemp("asr")
    vocab = {"<pad>": 0, "|": 4, "a": 5, "b": 6, "c": 7, "<s>": 1, "</s>": 2, "<unk>": 3}
    (d / "vocab.json").write_text(json.dumps(vocab))
    cfg = HFConfig(
        conv_dim=[16, 16], conv_stride=[5, 2], conv_kernel=[10, 3],
        hidden_size=24, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=48, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, vocab_size=len(vocab),
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, final_dropout=0.0,
    )
    torch.manual_seed(0)
    model = HFModel(cfg)
    model.save_pretrained(d, safe_serialization=False)
    return str(d)


def test_full_eval_loop(tmp_path, tiny_asr_dir):
    from tests.test_inference_cli import _tiny_vocoder, trained_ckpt  # noqa: F401

    # Reuse the trained-checkpoint fixture machinery manually.
    import tests.test_inference_cli as tic

    class FakeFactory:
        def __init__(self, base):
            self.base = base

        def mktemp(self, name):
            p = self.base / name
            p.mkdir(parents=True, exist_ok=True)
            return p

    root, cfg = tic.trained_ckpt.__wrapped__(FakeFactory(tmp_path))
    voc_ckpt, voc_cfg = tic._tiny_vocoder(tmp_path)

    refs_root = tmp_path / "refs"
    refs_root.mkdir()
    (refs_root / "test.txt").write_text("a b c\nb a\n")  # test.tsv has 2 rows

    from mm_s2ut.cli.inference_all import main

    rc = main([
        "--model_path", str(root / "ckpt"),
        "--subsets", "test",
        "--results-root", str(tmp_path / "results"),
        "--vocoder", str(voc_ckpt),
        "--vocoder-cfg", str(voc_cfg),
        "--asr-model", tiny_asr_dir,
        "--reference-root", str(refs_root),
        "--beam", "2",
    ])
    assert rc == 0
    out = tmp_path / "results" / "test"
    # The reference's artifact chain, file for file (SURVEY.md §3.5).
    assert (out / "generate-test.txt").exists()
    assert (out / "test.unit").exists()
    wavs = list((out / "tts").glob("*_pred.wav"))
    assert len(wavs) == 2  # one per manifest row
    transcript = (out / "transcript.txt").read_text().splitlines()
    assert len(transcript) == 2
    bleu_txt = (out / "bleu.txt").read_text()
    assert "BLEU" in bleu_txt
