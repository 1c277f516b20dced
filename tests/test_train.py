"""Training-layer tests: criterion math, CTC, schedule, sharded train step."""
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mm_s2ut  # noqa: F401  (registration)
from mm_s2ut import registry
from mm_s2ut.config import Config, ModelConfig, MultimodalConfig, TrainConfig
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.ops.ctc import ctc_greedy_decode, ctc_loss
from mm_s2ut.train.criterion import kl_symmetric, label_smoothed_nll_loss
from mm_s2ut.train.optimizer import build_optimizer, build_schedule
from mm_s2ut.train.trainer import Trainer, TrainState, make_train_step


def test_label_smoothed_ce_against_manual():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5))
    targets = jnp.array([[0, 2, 1], [3, 1, 1]])  # pad=1
    loss, ntokens, m = label_smoothed_nll_loss(logits, targets, epsilon=0.1, pad_id=1)
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    expected = 0.0
    for b, t in [(0, 0), (0, 1), (1, 0)]:
        nll = -logp[b, t, int(targets[b, t])]
        smooth = -logp[b, t].mean()
        expected += 0.9 * nll + 0.1 * smooth
    assert float(ntokens) == 3
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_kl_symmetric_zero_for_identical():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5))
    targets = jnp.array([[0, 2, 1], [3, 1, 1]])
    assert abs(float(kl_symmetric(logits, logits, targets))) < 1e-6
    other = logits + jax.random.normal(jax.random.PRNGKey(1), logits.shape)
    assert float(kl_symmetric(logits, other, targets)) > 0


def test_ctc_loss_against_torch():
    torch = pytest.importorskip("torch")
    B, T, V, L = 3, 11, 7, 4
    rng = np.random.RandomState(0)
    logits = rng.randn(B, T, V).astype(np.float32)
    labels = rng.randint(1, V, (B, L)).astype(np.int32)
    logit_lens = np.array([11, 9, 7])
    label_lens = np.array([4, 3, 2])
    got = np.asarray(
        ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
                 jnp.asarray(label_lens), blank_id=0)
    )
    t_logp = torch.log_softmax(torch.tensor(logits), -1).transpose(0, 1)
    want = torch.nn.functional.ctc_loss(
        t_logp, torch.tensor(labels.astype(np.int64)),
        torch.tensor(logit_lens), torch.tensor(label_lens),
        blank=0, reduction="none",
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_greedy_decode():
    # Frames argmax: [5 5 0 3 3 0 0 4] -> collapsed [5, 3, 4]
    path = [5, 5, 0, 3, 3, 0, 0, 4]
    logits = np.full((1, len(path), 6), -10.0, np.float32)
    for t, v in enumerate(path):
        logits[0, t, v] = 10.0
    out = np.asarray(ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([len(path)])))
    assert [x for x in out[0] if x >= 0] == [5, 3, 4]


def test_inverse_sqrt_schedule():
    cfg = TrainConfig(lr=5e-4, warmup_updates=100, warmup_init_lr=1e-7)
    s = build_schedule(cfg)
    assert float(s(1)) < float(s(50)) < float(s(99))
    np.testing.assert_allclose(float(s(100)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(400)), 5e-4 * 0.5, rtol=1e-5)


def _tiny_cfg():
    model = ModelConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=1, decoder_attention_heads=2, conv_channels=16,
        vocab_size=30, dtype="float32",
        multimodal=MultimodalConfig(
            image_feat_dim=[8], multimodal_attention_type="selective_attention",
            modality_dropout=0.3, audio_dropout=0.5,
        ),
    )
    return Config(model=model, train=TrainConfig(update_freq=1, warmup_updates=10, lr=1e-3))


def _batch(B=4, T=33, Tt=6):
    rng = np.random.RandomState(0)
    prev = rng.randint(4, 30, (B, Tt)).astype(np.int32)
    target = np.roll(prev, -1, axis=1)
    target[:, -1] = 2
    return {
        "src_features": rng.randn(B, T, 80).astype(np.float32),
        "src_lengths": np.maximum(T - 7 * np.arange(B), 12),
        "prev_output_tokens": prev,
        "target": target,
        "imgs_list": (rng.randn(B, 5, 8).astype(np.float32),),
        "img_masks_list": (np.zeros((B, 5), bool),),
    }


def test_trainer_loss_decreases_on_overfit():
    cfg = _tiny_cfg()
    model = MMS2UTModel(cfg.model)
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, params)
    losses = []
    for i in range(30):
        m = jax.device_get(trainer.train_batch(batch))
        losses.append(float(m["loss"]) / float(m["ntokens"]))
    assert losses[-1] < losses[0] * 0.75, losses[:3] + losses[-3:]
    assert int(trainer.state.step) == 30


def test_train_step_dp_sharding():
    """Gradient sync across the 8-device data-parallel mesh: train step runs
    with batch sharded over 'data' and params replicated."""
    cfg = _tiny_cfg()
    cfg.mesh.data = 8
    model = MMS2UTModel(cfg.model)
    batch = _batch(B=8)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, params)
    m = jax.device_get(trainer.train_batch(batch))
    assert np.isfinite(float(m["loss"]))
    # Params remain replicated after the update.
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    cfg.train.save_dir = str(tmp_path / "ckpt")
    model = MMS2UTModel(cfg.model)
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, params)
    trainer.train_batch(batch)
    trainer.save_checkpoint({"loss": 1.0})
    before = jax.device_get(trainer.state.params)
    trainer.train_batch(batch)
    trainer.restore_checkpoint()
    after = jax.device_get(trainer.state.params)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(before, after)


def test_full_resume_restores_step_and_opt_state(tmp_path):
    cfg = _tiny_cfg()
    cfg.train.save_dir = str(tmp_path / "ckpt")
    model = MMS2UTModel(cfg.model)
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, params)
    for _ in range(3):
        trainer.train_batch(batch)
    trainer.save_checkpoint({"loss": 1.0})
    trainer.train_batch(batch)
    assert int(trainer.state.step) == 4
    trainer.restore_checkpoint()
    assert int(trainer.state.step) == 3  # full resume incl. step


def test_load_component(tmp_path):
    from mm_s2ut.utils.checkpoint import average_checkpoints, load_component

    cfg = _tiny_cfg()
    cfg.train.save_dir = str(tmp_path / "ckpt")
    model = MMS2UTModel(cfg.model)
    batch = _batch()
    init = lambda seed: model.init(
        jax.random.PRNGKey(seed),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, init(0))
    trainer.train_batch(batch)
    trainer.save_checkpoint()

    fresh = init(7)
    loaded = load_component(fresh, cfg.train.save_dir, "encoder")
    trained_enc = jax.device_get(trainer.state.params)["params"]["encoder"]
    got_enc = jax.device_get(loaded)["params"]["encoder"]
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(got_enc, trained_enc)
    # Decoder stays at the fresh init.
    fresh_dec = jax.device_get(fresh)["params"]["decoder"]
    got_dec = jax.device_get(loaded)["params"]["decoder"]
    chex.assert_trees_all_close(got_dec, fresh_dec)

    avg = average_checkpoints([cfg.train.save_dir])
    leaf = jax.tree_util.tree_leaves(avg["params"]["encoder"])[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_remat_encoder_grad_matches():
    """checkpoint_activations=True must not change values or gradients."""
    cfg_a, cfg_b = _tiny_cfg(), _tiny_cfg()
    cfg_b.model.checkpoint_activations = True
    batch = _batch(B=2)
    model_a = MMS2UTModel(cfg_a.model)
    model_b = MMS2UTModel(cfg_b.model)
    params = model_a.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )

    def loss(model, p):
        out = model.apply(
            p, batch["src_features"], batch["src_lengths"],
            batch["prev_output_tokens"], batch["imgs_list"], batch["img_masks_list"],
        )
        return out["logits"].astype(jnp.float32).sum()

    la, ga = jax.value_and_grad(lambda p: loss(model_a, p))(params)
    lb, gb = jax.value_and_grad(lambda p: loss(model_b, p))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(ga, gb, rtol=1e-5, atol=1e-6)


def test_nonfinite_update_skipped():
    """A batch that produces NaN/Inf gradients must not corrupt params
    (fairseq overflow-skip analog)."""
    cfg = _tiny_cfg()
    model = MMS2UTModel(cfg.model)
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, params)
    before = jax.device_get(trainer.state.params)
    bad = dict(batch)
    bad["src_features"] = batch["src_features"] * np.inf
    m = jax.device_get(trainer.train_batch(bad))
    assert float(m["skipped"]) == 1.0
    after = jax.device_get(trainer.state.params)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(before, after)  # untouched
    assert int(trainer.state.step) == 1  # step still advances
    # A good batch afterwards updates normally.
    m2 = jax.device_get(trainer.train_batch(batch))
    assert float(m2["skipped"]) == 0.0


def test_rdrop_criterion_autoselected():
    """rdrop_alpha > 0 must engage the v2 criterion (symmetric KL), not be
    silently ignored by the base criterion."""
    cfg = _tiny_cfg()
    cfg.train.rdrop_alpha = 0.5
    model = MMS2UTModel(cfg.model)
    batch = _batch(B=2)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, params)
    m = jax.device_get(trainer.train_batch(batch))
    assert "kl_loss" in m  # v2 criterion actually ran
    assert np.isfinite(float(m["kl_loss"]))


def test_train_step_multiframe_units():
    """n_frames_per_step=2 end-to-end: packed decoder input, n·V expanded
    logits, CE against the unpacked base-V target (reference
    TransformerUnitDecoder out_proj_n_frames semantics)."""
    from mm_s2ut.data.dataset import pack_units
    from mm_s2ut.data.dictionary import UnitDictionary

    cfg = _tiny_cfg()
    cfg.model.n_frames_per_step = 2
    cfg.model.multimodal = MultimodalConfig(multimodal_attention_type=None)
    model = MMS2UTModel(cfg.model)
    d = UnitDictionary(26)  # vocab 30
    rng = np.random.RandomState(0)
    B, T_units = 2, 8  # 8 units + EOS → packed length 5
    raw = [
        np.concatenate([d.units_to_ids(rng.randint(0, 26, T_units)), [d.eos()]])
        for _ in range(B)
    ]
    packed = [pack_units(r, 2, len(d)) for r in raw]
    Lp = max(len(p) for p in packed)
    Lt = 2 * (Lp - 1) + 1
    prev = np.full((B, Lp), d.pad(), np.int32)
    target = np.full((B, Lt), d.pad(), np.int32)
    for i in range(B):
        prev[i, 0] = d.eos()
        prev[i, 1:len(packed[i])] = packed[i][:-1]
        target[i, : len(raw[i])] = raw[i]
    batch = {
        "src_features": rng.randn(B, 33, 80).astype(np.float32),
        "src_lengths": np.asarray([33, 21]),
        "prev_output_tokens": prev,
        "target": target,
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["src_features"], batch["src_lengths"],
        batch["prev_output_tokens"],
    )
    out = model.apply(
        params, batch["src_features"], batch["src_lengths"],
        batch["prev_output_tokens"],
    )
    # Each packed position expands to 2 sub-frame logit rows.
    assert out["logits"].shape == (B, 2 * Lp, len(d))

    # Generation over packed units is explicitly unsupported (raises).
    # (Checked before training: the jitted train step donates params.)
    enc = model.apply(
        params, batch["src_features"], batch["src_lengths"],
        deterministic=True, method=model.encode,
    )
    with pytest.raises(NotImplementedError):
        model.apply(params, enc, 9, method=model.decode_init)

    trainer = Trainer(cfg, model, params)
    m1 = trainer.train_batch(batch)
    m2 = trainer.train_batch(batch)
    assert np.isfinite(m1["loss"]) and m2["loss"] < m1["loss"] * 1.5


def test_freezing_updates_gates_speech_branch():
    """--freezing-updates N: the pretrained speech_encoder subtree must not
    move for the first N updates and must move afterwards (reference
    tasks/speech_to_speech.py:70-73, unfreeze_module)."""
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config

    cfg = _tiny_cfg()
    cfg.model.speech_encoder_type = "hubert"
    cfg.train.freezing_updates = 2
    # weight_decay > 0 exercises the post-transform update mask: the
    # add_decayed_weights term must not shrink the frozen subtree
    # (fairseq's --freezing-updates leaves frozen modules bit-identical).
    cfg.train.weight_decay = 0.1
    w2v = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, mask_time_prob=0.0,
        hidden_dropout=0.0, attention_dropout=0.0, use_flash_attention=False,
    )
    model = MMS2UTModel(cfg.model, w2v_cfg=w2v)
    rng = np.random.RandomState(0)
    B, Tt = 2, 6
    prev = rng.randint(4, 30, (B, Tt)).astype(np.int32)
    target = np.roll(prev, -1, axis=1)
    target[:, -1] = 2
    batch = {
        "src_features": rng.randn(B, 800).astype(np.float32),
        "src_lengths": np.asarray([800, 600]),
        "prev_output_tokens": prev,
        "target": target,
        "imgs_list": (rng.randn(B, 5, 8).astype(np.float32),),
        "img_masks_list": (np.zeros((B, 5), bool),),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        batch["src_features"], batch["src_lengths"], batch["prev_output_tokens"],
        batch["imgs_list"], batch["img_masks_list"],
    )
    trainer = Trainer(cfg, model, params)

    def branch_snapshot():
        sub = trainer.state.params["params"]["speech_encoder"]
        return jax.device_get(
            sub["layer0"]["attention"]["q_proj"]["kernel"]
        ).copy()

    def dec_snapshot():
        return jax.device_get(
            trainer.state.params["params"]["decoder"]["embed"]["embed_tokens"]["embedding"]
        ).copy()

    s0, d0 = branch_snapshot(), dec_snapshot()
    trainer.train_batch(batch)
    trainer.train_batch(batch)
    s2, d2 = branch_snapshot(), dec_snapshot()
    np.testing.assert_array_equal(s0, s2)  # frozen for 2 updates
    assert not np.allclose(d0, d2)  # the rest trains
    trainer.train_batch(batch)
    s3 = branch_snapshot()
    assert not np.allclose(s2, s3)  # unfrozen at step 2
