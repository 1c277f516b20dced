"""wav2vec2 family tests: HF numerical parity, masking, in-layer fusion."""
import pytest

pytestmark = pytest.mark.slow
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_s2ut.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2ForCTC,
    Wav2Vec2Model,
    Wav2Vec2WithMultiModal,
    convert_hf_state_dict,
    span_mask,
)

TINY = Wav2Vec2Config(
    conv_dim=(16, 16),
    conv_stride=(5, 2),
    conv_kernel=(10, 3),
    hidden_size=24,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=48,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    vocab_size=11,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    feat_proj_dropout=0.0,
)


def _hf_tiny(stable=False):
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    hf_cfg = HFConfig(
        conv_dim=list(TINY.conv_dim),
        conv_stride=list(TINY.conv_stride),
        conv_kernel=list(TINY.conv_kernel),
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        intermediate_size=TINY.intermediate_size,
        num_conv_pos_embeddings=TINY.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=TINY.num_conv_pos_embedding_groups,
        do_stable_layer_norm=stable,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        feat_extract_norm="layer" if stable else "group",
        conv_bias=stable,
    )
    return HFModel(hf_cfg).eval(), hf_cfg


@pytest.mark.parametrize("stable", [False, True])
def test_hf_parity(stable):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    hf_model, hf_cfg = _hf_tiny(stable)
    cfg = Wav2Vec2Config.from_hf(hf_cfg)
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    variables = convert_hf_state_dict(sd, cfg)

    x = np.random.RandomState(0).randn(2, 800).astype(np.float32) * 0.1
    with torch.no_grad():
        want = hf_model(torch.tensor(x)).last_hidden_state.numpy()

    model = Wav2Vec2Model(cfg)
    out = model.apply(variables, jnp.asarray(x))
    got = np.asarray(out["last_hidden_state"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_feature_lengths():
    lens = TINY.feature_lengths(jnp.asarray([800, 400]))
    # 800 -> (800-10)//5+1=159 -> (159-3)//2+1=79; 400 -> 79 -> 39
    assert list(np.asarray(lens)) == [79, 39]


def test_span_mask_properties():
    lengths = jnp.asarray([50, 20])
    mask = span_mask(jax.random.PRNGKey(0), (2, 50), 0.5, 5, lengths)
    m = np.asarray(mask)
    assert m.shape == (2, 50)
    assert m[1, 20:].sum() == 0  # no masking in padding
    assert m[0].sum() >= 5  # at least one span
    # Spans have the configured length (runs of >= 1 each <= contiguous).
    assert m.sum() > 0


def test_ctc_model_and_grad_stops_at_feature_extractor():
    model = Wav2Vec2ForCTC(TINY)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 800).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["logits"].shape == (1, 79, 11)

    def loss(v):
        return model.apply(v, x)["logits"].sum()

    grads = jax.grad(loss)(variables)
    conv_grad = grads["params"]["wav2vec2"]["feature_extractor"]["conv0"]["kernel"]
    assert float(jnp.abs(conv_grad).sum()) == 0.0  # frozen conv frontend
    ffn_grad = grads["params"]["wav2vec2"]["layer0"]["intermediate_dense"]["kernel"]
    assert float(jnp.abs(ffn_grad).sum()) > 0.0


def test_multimodal_inlayer_fusion():
    model = Wav2Vec2WithMultiModal(TINY, m2_dim=8, num_cross_attention_layers=1)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 800).astype(np.float32))
    img = jnp.asarray(np.random.RandomState(1).randn(2, 6, 8).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, None, img)
    out = model.apply(variables, x, None, img)
    assert out["last_hidden_state"].shape == (2, 79, 24)
    # Image actually influences the output.
    out2 = model.apply(variables, x, None, img * 0 + 1.0)
    assert not np.allclose(
        np.asarray(out["last_hidden_state"]), np.asarray(out2["last_hidden_state"])
    )


def test_pad_to_multiple_matches_unpadded():
    import dataclasses

    cfg8 = dataclasses.replace(TINY, pad_to_multiple=8)
    x = np.random.RandomState(0).randn(2, 800).astype(np.float32)
    lens = jnp.asarray([800, 600])
    base = Wav2Vec2Model(TINY)
    padded = Wav2Vec2Model(cfg8)
    params = base.init(jax.random.PRNGKey(0), jnp.asarray(x), lens)
    out_a = base.apply(params, jnp.asarray(x), lens)
    out_b = padded.apply(params, jnp.asarray(x), lens)
    T = out_a["last_hidden_state"].shape[1]  # 79
    assert out_b["last_hidden_state"].shape[1] == 80
    np.testing.assert_array_equal(np.asarray(out_a["lengths"]), np.asarray(out_b["lengths"]))
    np.testing.assert_allclose(
        np.asarray(out_a["last_hidden_state"])[:, : int(out_a["lengths"][1])],
        np.asarray(out_b["last_hidden_state"])[:, : int(out_a["lengths"][1])],
        atol=2e-5, rtol=1e-4,
    )


def test_layerdrop_skips_layers():
    """layerdrop=1.0 at train time must skip every encoder layer (reference
    fuse.py:599-601): the final hidden state equals the pre-loop state."""
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, layerdrop=1.0,
        hidden_dropout=0.0, attention_dropout=0.0, mask_time_prob=0.0,
        use_flash_attention=False,
    )
    model = Wav2Vec2Model(cfg)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 800), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), wav, deterministic=True)
    out = model.apply(
        variables, wav, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        np.asarray(out["hidden_states"][0]), atol=1e-6,
    )
    # layerdrop=0 path unchanged: deterministic forward ignores it.
    out_det = model.apply(variables, wav, deterministic=True)
    assert not np.allclose(
        np.asarray(out_det["last_hidden_state"]),
        np.asarray(out_det["hidden_states"][0]),
    )


def test_multimodal_layerdrop_covers_fusion():
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2WithMultiModal

    cfg = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, layerdrop=1.0,
        hidden_dropout=0.0, attention_dropout=0.0, mask_time_prob=0.0,
        use_flash_attention=False,
    )
    model = Wav2Vec2WithMultiModal(cfg, m2_dim=16, num_cross_attention_layers=1)
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(2, 800), jnp.float32)
    img = jnp.asarray(rng.randn(2, 4, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), wav, None, img, deterministic=True)
    out = model.apply(
        variables, wav, None, img, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    # All layers AND their fused cross-attention skipped.
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        np.asarray(out["hidden_states"][0]), atol=1e-6,
    )


def test_gradient_checkpointing_same_numerics():
    """remat changes memory, not numerics: outputs and grads identical."""
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

    kw = dict(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
        attention_dropout=0.0, mask_time_prob=0.0, use_flash_attention=False,
    )
    wav = jnp.asarray(np.random.RandomState(2).randn(2, 800), jnp.float32)
    outs, grads = [], []
    for remat in (False, True):
        cfg = Wav2Vec2Config(gradient_checkpointing=remat, **kw)
        model = Wav2Vec2Model(cfg)
        variables = model.init(jax.random.PRNGKey(0), wav, deterministic=True)

        def loss(v):
            return model.apply(v, wav, deterministic=True)[
                "last_hidden_state"
            ].sum()

        outs.append(float(loss(variables)))
        grads.append(jax.grad(loss)(variables))
    assert abs(outs[0] - outs[1]) < 1e-4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        grads[0], grads[1],
    )


def test_multimodal_gradient_checkpointing_same_numerics():
    """Wav2Vec2WithMultiModal must accept remat-wrapped layers (positional
    layer call — regression for the kwargs/static_argnums crash) with
    identical numerics to the unremat graph."""
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2WithMultiModal

    kw = dict(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
        attention_dropout=0.0, mask_time_prob=0.0, use_flash_attention=False,
    )
    rng = np.random.RandomState(3)
    wav = jnp.asarray(rng.randn(2, 800), jnp.float32)
    img = jnp.asarray(rng.randn(2, 4, 16), jnp.float32)
    outs, grads = [], []
    for remat in (False, True):
        cfg = Wav2Vec2Config(gradient_checkpointing=remat, **kw)
        model = Wav2Vec2WithMultiModal(cfg, m2_dim=16, num_cross_attention_layers=1)
        variables = model.init(jax.random.PRNGKey(0), wav, None, img, deterministic=True)

        def loss(v):
            return model.apply(v, wav, None, img, deterministic=True)[
                "last_hidden_state"
            ].sum()

        outs.append(float(loss(variables)))
        grads.append(jax.grad(loss)(variables))
    assert abs(outs[0] - outs[1]) < 1e-4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        grads[0], grads[1],
    )


def test_parse_conv_feature_layers():
    from mm_s2ut.utils.fairseq_convert import _parse_conv_feature_layers

    spec = "[(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2"
    out = _parse_conv_feature_layers(spec)
    assert len(out) == 7 and out[0] == (512, 10, 5) and out[-1] == (512, 2, 2)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _parse_conv_feature_layers("__import__('os')")
    with _pytest.raises(ValueError):
        _parse_conv_feature_layers("[(1,2)]")
