"""Pipeline parallelism (parallel/pipeline.py): GPipe over the `pipe` axis.

Identity contract: with the same stacked params, the pipelined stack is
(bit-)equal to sequential layer application — each layer runs on exactly
one device with identical math. Verified for forward, grads, dp x pp
composition, and the flagship encoder + train step integration.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mm_s2ut.parallel import (
    PIPE_AXIS,
    make_mesh,
    gpipe,
    param_shardings,
    stack_layer_params,
    unstack_layer_params,
)

pytestmark = pytest.mark.slow


def _toy_layer(p, layer_idx, x, extras, mb_extras):
    del layer_idx, mb_extras
    h = jnp.tanh(x @ p["w"] + p["b"])
    return h + x * extras["scale"][:, None]


def _toy_setup(L=8, B=8, D=16):
    rng = np.random.RandomState(0)
    params = {
        "w": jnp.asarray(rng.randn(L, D, D) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(L, D) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.randn(B, D), jnp.float32)
    extras = {"scale": jnp.asarray(rng.rand(B), jnp.float32)}
    return params, x, extras


def _sequential(params, x, extras):
    L = params["w"].shape[0]

    def body(h, pl):
        p, li = pl
        return _toy_layer(p, li, h, extras, {}), None

    h, _ = jax.lax.scan(body, x, (params, jnp.arange(L)))
    return h


def test_gpipe_forward_matches_sequential():
    params, x, extras = _toy_setup()
    mesh = make_mesh(data=2, pipe=4)
    y_seq = jax.jit(_sequential)(params, x, extras)
    with jax.set_mesh(mesh):
        y_pp = jax.jit(
            lambda p, x, e: gpipe(_toy_layer, p, x, e, n_stages=4, n_micro=4)
        )(params, x, extras)
    assert np.array_equal(np.asarray(y_seq), np.asarray(y_pp))


def test_gpipe_uneven_micro_and_stage_counts():
    params, x, extras = _toy_setup(L=8, B=12)
    mesh = make_mesh(data=4, pipe=2)
    y_seq = jax.jit(_sequential)(params, x, extras)
    with jax.set_mesh(mesh):
        # 2 stages x 4 layers each, 6 microbatches of 2.
        y_pp = jax.jit(
            lambda p, x, e: gpipe(_toy_layer, p, x, e, n_stages=2, n_micro=6)
        )(params, x, extras)
    assert np.allclose(np.asarray(y_seq), np.asarray(y_pp), atol=0, rtol=0)


def test_gpipe_grads_match_sequential():
    params, x, extras = _toy_setup()
    mesh = make_mesh(data=2, pipe=4)

    def loss_seq(p):
        return jnp.sum(_sequential(p, x, extras) ** 2)

    def loss_pp(p):
        return jnp.sum(gpipe(_toy_layer, p, x, extras, n_stages=4, n_micro=4) ** 2)

    g_seq = jax.jit(jax.grad(loss_seq))(params)
    with jax.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss_pp))(params)
    for k in g_seq:
        assert np.allclose(np.asarray(g_seq[k]), np.asarray(g_pp[k]),
                           atol=1e-5), k


def test_gpipe_dp_pp_sharded_inputs():
    """Batch sharded over data, stages over pipe — composes in one jit."""
    params, x, extras = _toy_setup()
    mesh = make_mesh(data=2, pipe=4)
    y_seq = jax.jit(_sequential)(params, x, extras)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ps = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("pipe"))), params)
        y_pp = jax.jit(
            lambda p, x, e: gpipe(_toy_layer, p, x, e, n_stages=4, n_micro=4)
        )(ps, xs, extras)
    assert np.allclose(np.asarray(y_seq), np.asarray(y_pp), atol=1e-6)


def test_gpipe_remat_matches():
    params, x, extras = _toy_setup()
    mesh = make_mesh(data=2, pipe=4)

    def loss(p, remat):
        return jnp.sum(gpipe(_toy_layer, p, x, extras,
                             n_stages=4, n_micro=4, remat=remat) ** 2)

    with jax.set_mesh(mesh):
        g0 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    for k in g0:
        assert np.allclose(np.asarray(g0[k]), np.asarray(g1[k]), atol=1e-6), k


def test_stack_unstack_roundtrip():
    rng = np.random.RandomState(1)
    layers = {
        f"layer{i}": {"w": jnp.asarray(rng.randn(3, 3), jnp.float32),
                      "ln": {"scale": jnp.asarray(rng.randn(3), jnp.float32)}}
        for i in range(4)
    }
    layers["subsampler"] = {"k": jnp.zeros((2,))}  # ignored non-layer key
    stacked = stack_layer_params(layers)
    assert stacked["w"].shape == (4, 3, 3)
    back = unstack_layer_params(stacked)
    for i in range(4):
        assert np.array_equal(np.asarray(back[f"layer{i}"]["w"]),
                              np.asarray(layers[f"layer{i}"]["w"]))


def _enc_kwargs(pp=0):
    return dict(
        embed_dim=32, ffn_dim=64, num_layers=4, num_heads=4,
        conv_channels=16, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, use_flash=False,
        pipeline_stages=pp, pipeline_microbatches=0,
        dtype=jnp.float32,
    )


def test_pipelined_encoder_matches_sequential():
    """Flagship encoder stack: PP output == sequential output after
    converting layer{i} params to the stacked layout."""
    from mm_s2ut.models.s2t_encoder import SpeechTransformerEncoder

    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(4, 64, 80), jnp.float32)
    lengths = jnp.asarray([64, 50, 40, 33], jnp.int32)

    seq_enc = SpeechTransformerEncoder(**_enc_kwargs(pp=0))
    seq_params = seq_enc.init(jax.random.PRNGKey(0), feats, lengths)
    out_seq = seq_enc.apply(seq_params, feats, lengths)["encoder_out"]

    pp_enc = SpeechTransformerEncoder(**_enc_kwargs(pp=2))
    p = dict(seq_params["params"])
    stacked = stack_layer_params(p)
    for i in range(4):
        del p[f"layer{i}"]
    p["pipe_stack"] = {"layers": stacked}
    mesh = make_mesh(data=4, pipe=2)
    with jax.set_mesh(mesh):
        out_pp = jax.jit(
            lambda v, f, l: pp_enc.apply(v, f, l)["encoder_out"]
        )({"params": p}, feats, lengths)
    assert np.allclose(np.asarray(out_seq), np.asarray(out_pp), atol=1e-5)


def test_pipelined_flagship_train_step():
    """Full flagship train step with a PP encoder on a dp x pp mesh:
    params shard P(pipe,...) on the stack, loss is finite and decreases."""
    from mm_s2ut import registry
    from mm_s2ut.config import ModelConfig, MultimodalConfig, TrainConfig
    from mm_s2ut.models.mm_s2ut import MMS2UTModel
    from mm_s2ut.parallel import replicated, shard_batch
    from mm_s2ut.train.optimizer import build_optimizer
    from mm_s2ut.train.trainer import TrainState, make_train_step

    cfg = ModelConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=4,
        encoder_attention_heads=4, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=2,
        decoder_attention_heads=4, conv_channels=16, vocab_size=68,
        dtype="float32", use_flash_attention=False,
        pipeline_stages=2,
        multimodal=MultimodalConfig(
            image_feat_dim=[24],
            multimodal_attention_type="selective_attention",
            use_selective_gate=True,
        ),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(3)
    B, T, Tt = 4, 64, 8
    batch = {
        "src_features": rng.randn(B, T, 80).astype(np.float32),
        "src_lengths": np.array([64, 50, 40, 33], np.int32),
        "prev_output_tokens": rng.randint(4, 64, (B, Tt)).astype(np.int32),
        "target": rng.randint(4, 64, (B, Tt)).astype(np.int32),
        "imgs_list": (rng.randn(B, 12, 24).astype(np.float32),),
        "img_masks_list": (np.zeros((B, 12), bool),),
    }
    mesh = make_mesh(data=2, pipe=2, model=2)
    with jax.set_mesh(mesh):
        params = model.init(
            jax.random.PRNGKey(0), batch["src_features"], batch["src_lengths"],
            batch["prev_output_tokens"], batch["imgs_list"], batch["img_masks_list"],
        )
    shardings = param_shardings(mesh, params)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    pp_specs = [s for kp, s in flat if PIPE_AXIS in str(s.spec)]
    assert pp_specs, "stacked encoder params must shard over the pipe axis"

    tx = build_optimizer(TrainConfig(update_freq=1, warmup_updates=10))
    state = TrainState.create(params, tx)
    state = jax.device_put(
        state,
        TrainState(
            step=replicated(mesh),
            params=shardings,
            opt_state=jax.tree_util.tree_map(
                lambda _: replicated(mesh), state.opt_state),
        ),
    )
    criterion = registry.get_criterion("speech_to_unit")
    step_fn = jax.jit(
        make_train_step(model, criterion, tx, {"label_smoothing": 0.2}),
        donate_argnums=(0,),
    )
    sharded = shard_batch(mesh, batch)
    losses = []
    with jax.set_mesh(mesh):
        for i in range(5):
            state, metrics = step_fn(state, sharded, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
