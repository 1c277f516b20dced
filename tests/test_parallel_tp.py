"""Tensor-parallel correctness: sharding params Megatron-style over the
model axis must not change the math (XLA inserts the collectives)."""
import pytest

pytestmark = pytest.mark.slow
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_s2ut.config import ModelConfig, MultimodalConfig
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.parallel import make_mesh, param_shardings, replicated, shard_batch


def _model_and_batch():
    cfg = ModelConfig(
        encoder_embed_dim=64, encoder_ffn_embed_dim=128, encoder_layers=2,
        encoder_attention_heads=2, decoder_embed_dim=64, decoder_ffn_embed_dim=128,
        decoder_layers=2, decoder_attention_heads=2, conv_channels=32,
        vocab_size=40, dtype="float32",
        multimodal=MultimodalConfig(image_feat_dim=[16],
                                    multimodal_attention_type="selective_attention"),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    B = 4
    args = (
        rng.randn(B, 33, 80).astype(np.float32),
        np.array([33, 30, 21, 12]),
        rng.randint(4, 40, (B, 6)).astype(np.int32),
        (rng.randn(B, 9, 16).astype(np.float32),),
        (np.zeros((B, 9), bool),),
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, args


def test_tp_matches_replicated():
    model, params, args = _model_and_batch()

    def forward(p, *a):
        return model.apply(p, *a)["logits"]

    # Baseline: fully replicated on a trivial mesh.
    base = np.asarray(jax.jit(forward)(params, *args))

    mesh = make_mesh(data=2, model=4)
    sharded_params = jax.device_put(params, param_shardings(mesh, params))
    # Check at least one leaf actually got model-sharded.
    leaves = jax.tree_util.tree_leaves_with_path(sharded_params)
    assert any(
        not leaf.sharding.is_fully_replicated for _, leaf in leaves
    ), "TP rules matched nothing"
    sharded_args = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), replicated(mesh))
        if np.ndim(x) > 0 else x,
        args,
    )
    tp = np.asarray(jax.jit(forward)(sharded_params, *sharded_args))
    np.testing.assert_allclose(tp, base, atol=2e-4, rtol=1e-4)


def test_dp_plus_tp_train_step_runs():
    from mm_s2ut import registry
    from mm_s2ut.config import TrainConfig
    from mm_s2ut.train.optimizer import build_optimizer
    from mm_s2ut.train.trainer import TrainState, make_train_step

    model, params, args = _model_and_batch()
    mesh = make_mesh(data=4, model=2)
    batch = {
        "src_features": args[0], "src_lengths": args[1],
        "prev_output_tokens": args[2], "imgs_list": args[3],
        "img_masks_list": args[4],
        "target": np.roll(args[2], -1, 1),
    }
    tx = build_optimizer(TrainConfig(update_freq=1, warmup_updates=4))
    state = TrainState.create(params, tx)
    state = jax.device_put(
        state,
        TrainState(
            step=replicated(mesh),
            params=param_shardings(mesh, state.params),
            opt_state=jax.tree_util.tree_map(lambda _: replicated(mesh), state.opt_state),
        ),
    )
    criterion = registry.get_criterion("speech_to_unit")
    step = jax.jit(make_train_step(model, criterion, tx, {"label_smoothing": 0.2}))
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sequence_parallel_matches():
    """sequence_parallel sharding constraints must not change the math."""
    from mm_s2ut.models.s2t_encoder import SpeechTransformerEncoder

    feats = np.random.RandomState(0).randn(8, 32, 80).astype(np.float32)
    lengths = np.full((8,), 32)
    enc_a = SpeechTransformerEncoder(embed_dim=64, ffn_dim=128, num_layers=2,
                                     num_heads=2, conv_channels=32)
    enc_b = SpeechTransformerEncoder(embed_dim=64, ffn_dim=128, num_layers=2,
                                     num_heads=2, conv_channels=32,
                                     sequence_parallel=True)
    params = enc_a.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(lengths))
    base = np.asarray(enc_a.apply(params, jnp.asarray(feats), jnp.asarray(lengths))["encoder_out"])
    mesh = make_mesh(data=4, model=2)
    with jax.set_mesh(mesh):
        sp = np.asarray(
            jax.jit(lambda p, f, l: enc_b.apply(p, f, l)["encoder_out"])(
                params, jnp.asarray(feats), jnp.asarray(lengths)
            )
        )
    np.testing.assert_allclose(sp, base, atol=2e-5, rtol=1e-4)
    # Without a mesh context the constraint is a no-op (portability).
    nosp = np.asarray(enc_b.apply(params, jnp.asarray(feats), jnp.asarray(lengths))["encoder_out"])
    np.testing.assert_allclose(nosp, base, atol=1e-6)
