"""Core runtime tests: config surface, dictionary offsets, mesh/shardings."""
import numpy as np

from mm_s2ut import config as cfg_mod
from mm_s2ut.data.dictionary import Dictionary, UnitDictionary


def test_multimodal_yaml_surface(tmp_path):
    # Exact key surface of the reference multimodal_s2ut_transformer.yaml.
    y = tmp_path / "mm.yaml"
    y.write_text(
        """
SA_image_dropout: 0.1
SA_text_dropout: 0.0
SA_attention_dropout: 0.1
image_pre_norm: True
is_fusion_top: True
image_feat_path: [/data/image_feat/vit_base_patch16_384]
image_feat_dim: [768]
flickr30k_root: /data/flickr30k
load_visual_extractor_type: null
load_visual_extractor: null
modality_dropout: -0.5
audio_dropout: -0.5
multimodal_attention_type: multimodal_attention
use_selective_gate: True
is_merge_text_img: False
"""
    )
    mm = cfg_mod.load_multimodal_yaml(y)
    assert mm.SA_image_dropout == 0.1
    assert mm.is_fusion_top is True
    assert mm.image_feat_dim == [768]
    assert mm.modality_dropout == -0.5
    assert mm.multimodal_attention_type == "multimodal_attention"
    assert mm.only_img is False  # gap in reference yaml fixed as default


def test_unit_dictionary_offsets():
    d = UnitDictionary(1000, lang_tags=["<lang:en>", "<lang:fr>"])
    assert (d.bos(), d.pad(), d.eos(), d.unk()) == (0, 1, 2, 3)
    assert d.nspecial == 4
    assert d.index("0") == 4
    assert d.index("999") == 1003
    assert len(d) == 1006
    np.testing.assert_array_equal(d.units_to_ids([0, 5]), [4, 9])
    np.testing.assert_array_equal(d.ids_to_units([4, 9, 2, 1004]), [0, 5])
    assert d.lang_tag_index("en") == 1004


def test_dictionary_roundtrip(tmp_path):
    d = Dictionary()
    for w in ["hello", "world"]:
        d.add_symbol(w)
    p = tmp_path / "dict.txt"
    d.save(p)
    d2 = Dictionary.load(p)
    assert d2.index("world") == d.index("world")
    ids = d2.encode_line("hello world")
    assert ids.tolist() == [4, 5, d2.eos()]
    assert d2.string(ids) == "hello world"


def test_mesh_and_shardings():
    import jax
    from mm_s2ut.parallel import make_mesh, batch_sharding, param_shardings, shard_batch

    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "pipe": 1, "model": 2}
    params = {"layer0": {"fc1": {"kernel": np.zeros((8, 16)), "bias": np.zeros(16)}}}
    sh = param_shardings(mesh, params)
    assert sh["layer0"]["fc1"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    batch = {"x": np.zeros((8, 10))}
    out = shard_batch(make_mesh(data=8, model=1), batch)
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data", None)


def test_registry():
    import mm_s2ut  # registers everything
    from mm_s2ut import registry

    assert "multimodal_speech_to_speech" in registry.available("task")
    assert "multimodal_speech_to_text" in registry.available("task")
    assert "mm_s2ut_transformer" in registry.available("model")
    assert "mm_xm_transformer" in registry.available("model")
    assert "speech_to_unit" in registry.available("criterion")
    assert "speech_to_unit_v2" in registry.available("criterion")
    assert "mm_s2ut_transformer" in registry.available("arch")
    import pytest as _pytest

    with _pytest.raises(registry.RegistryError):
        registry.get_task("nope")


def test_apply_overrides_types():
    from mm_s2ut.cli.train import apply_overrides
    from mm_s2ut.config import Config

    cfg = Config()
    apply_overrides(cfg, [
        "train.max_update=123",
        "train.lr=0.01",
        "model.encoder_normalize_before=false",
        "data.data_root=/x/y",
        "model.conv_kernel_sizes=3,3,5",
    ])
    assert cfg.train.max_update == 123 and isinstance(cfg.train.max_update, int)
    assert cfg.train.lr == 0.01
    assert cfg.model.encoder_normalize_before is False
    assert cfg.data.data_root == "/x/y"
    assert cfg.model.conv_kernel_sizes == ["3", "3", "5"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals_sign"])


def test_load_multitask_yaml(tmp_path):
    from mm_s2ut.config import load_multitask_yaml

    y = tmp_path / "mt.yaml"
    y.write_text(
        """
target_letter:
  decoder_type: ctc
  loss_weight: 8.0
  dict: dict_letter.txt
decoder_target_ctc:
  decoder_type: transformer
  loss_weight: 2.0
  decoder_layers: 4
"""
    )
    tasks = load_multitask_yaml(y)
    by_name = {t.task_name: t for t in tasks}
    assert by_name["target_letter"].decoder_type == "ctc"
    assert by_name["target_letter"].loss_weight == 8.0
    assert by_name["decoder_target_ctc"].decoder_layers == 4


def test_input_feat_per_channel_validated(tmp_path):
    """input_feat_per_channel×input_channels must equal the fbank width —
    a mismatched value would silently describe a different model than the
    yaml claims (fairseq sizes the conv subsampler from this key)."""
    import pytest

    from mm_s2ut.config import Config, load_config, save_yaml

    cfg = Config()
    cfg.model.input_feat_per_channel = 40
    p = tmp_path / "bad.yaml"
    save_yaml(cfg, p)
    with pytest.raises(ValueError, match="input_feat_per_channel"):
        load_config(p)
    cfg.model.input_feat_per_channel = 80
    save_yaml(cfg, p)
    assert load_config(p).model.input_feat_per_channel == 80
