"""Streaming encoder: chunked incremental encoding must equal the
one-shot causal offline forward with the same parameters."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_s2ut.infer.streaming import (
    StreamingEncoderSession, mature_subsampled,
)
from mm_s2ut.models.s2t_encoder import SpeechTransformerEncoder

D, FFN, LAYERS, HEADS, CONV = 32, 64, 2, 2, 16


def _offline(window: int, kernels=(5, 5), activation="relu", pre_norm=True):
    return SpeechTransformerEncoder(
        embed_dim=D, ffn_dim=FFN, num_layers=LAYERS, num_heads=HEADS,
        conv_channels=CONV, causal_attention=True, attention_window=window,
        conv_kernel_sizes=kernels, activation=activation,
        normalize_before=pre_norm,
    )


@pytest.mark.parametrize(
    "window,kernels,activation,pre_norm",
    [
        (0, (5, 5), "relu", True),
        (6, (5, 5), "relu", True),
        # Non-default hyperparameters must stream identically too (the
        # session forwards activation/normalize_before/kernels).
        (0, (3, 3), "gelu", False),
    ],
)
def test_streamed_equals_offline_causal(window, kernels, activation, pre_norm):
    B, T, CHUNK = 2, 57, 16
    rng = np.random.RandomState(0)
    feats = rng.randn(B, T, 80).astype(np.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    enc = _offline(window, kernels, activation, pre_norm)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats), lengths)
    want = enc.apply(params, jnp.asarray(feats), lengths)
    want_out = np.asarray(want["encoder_out"])
    T_sub = int(want["lengths"][0])

    sess = StreamingEncoderSession(
        params, batch=B, chunk_frames=CHUNK, max_frames=128,
        embed_dim=D, ffn_dim=FFN, num_layers=LAYERS, num_heads=HEADS,
        conv_channels=CONV, attention_window=window,
        conv_kernel_sizes=kernels, activation=activation,
        normalize_before=pre_norm,
    )
    emitted = 0
    # Full chunks, then a short tail feed (T % CHUNK frames) — the last
    # feed of a stream may be shorter than chunk_frames.
    for start in range(0, T, CHUNK):
        new = sess.feed(feats[:, start : min(start + CHUNK, T)])
        n_new = new.shape[1]
        if n_new:
            np.testing.assert_allclose(
                new, want_out[:, emitted : emitted + n_new],
                atol=1e-5, rtol=1e-5,
            )
        emitted += n_new
    got, got_len = sess.finalize()
    assert int(got_len[0]) == T_sub
    np.testing.assert_allclose(got, want_out, atol=1e-5, rtol=1e-5)


def test_causal_prefix_property():
    """Offline causal encoding of a prefix equals the prefix of the full
    encoding (the property streaming relies on)."""
    B, T = 1, 64
    rng = np.random.RandomState(1)
    feats = rng.randn(B, T, 80).astype(np.float32)
    enc = _offline(0)
    params = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.full((B,), T, jnp.int32)
    )
    full = enc.apply(params, jnp.asarray(feats), jnp.full((B,), T, jnp.int32))
    Tp = 40
    pre = enc.apply(
        params, jnp.asarray(feats[:, :Tp]), jnp.full((B,), Tp, jnp.int32)
    )
    n = mature_subsampled(Tp)
    np.testing.assert_allclose(
        np.asarray(pre["encoder_out"])[:, :n],
        np.asarray(full["encoder_out"])[:, :n],
        atol=1e-5, rtol=1e-5,
    )


def test_mature_subsampled_matches_receptive_field():
    from mm_s2ut.infer.streaming import conv_input_halo

    # u depends on inputs [S·u-h, S·u+h]; mature when S·u+h <= T-1.
    for kernels in [(5, 5), (3, 3), (7, 5), (5, 5, 5)]:
        S = 2 ** len(kernels)
        h = conv_input_halo(kernels)
        for T in range(0, 60):
            m = mature_subsampled(T, kernels)
            if m:
                assert S * (m - 1) + h <= T - 1
            if T >= h + 1:
                assert S * m + h > T - 1  # the next row is NOT mature
    assert conv_input_halo((5, 5)) == 6  # the documented default


def test_retranslation_commit_rules():
    from mm_s2ut.infer.streaming import retranslation_commit

    # Agreement prefix extends the committed prefix → commit the tail.
    assert retranslation_commit([1, 2, 3], [1, 2, 3, 4], [1, 2]) == [3]
    # No agreement yet.
    assert retranslation_commit([], [1, 2], []) == []
    assert retranslation_commit([9, 2], [1, 2], []) == []
    # Hypotheses flipped away from the old commitment and re-stabilized
    # on a different string — must NOT splice its tail onto the old
    # prefix (the corrupted-mix case).
    assert retranslation_commit([7, 8, 9, 4], [7, 8, 9, 4], [1, 2, 3]) == []
    # Stable but shorter than committed → nothing new.
    assert retranslation_commit([1, 2], [1, 2], [1, 2]) == []


@pytest.mark.slow
def test_streaming_s2st_finalize_matches_offline():
    """StreamingS2ST.finalize() == offline beam decode of the same fed
    frames through the same causal-encoder model."""
    from mm_s2ut.config import GenerationConfig, ModelConfig, MultimodalConfig
    from mm_s2ut.infer.generator import UnitGenerator
    from mm_s2ut.infer.streaming import StreamingS2ST
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    V = 40
    cfg = ModelConfig(
        encoder_embed_dim=D, encoder_ffn_embed_dim=FFN, encoder_layers=LAYERS,
        encoder_attention_heads=HEADS, decoder_embed_dim=D,
        decoder_ffn_embed_dim=FFN, decoder_layers=1,
        decoder_attention_heads=HEADS, conv_channels=CONV, vocab_size=V,
        dtype="float32", encoder_causal_attention=True,
        use_flash_attention=False,
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    T, CHUNK = 48, 16
    feats = rng.randn(1, T, 80).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats),
        jnp.full((1,), T, jnp.int32), jnp.zeros((1, 3), jnp.int32),
    )

    MAXLEN = 10
    srv = StreamingS2ST(
        model, params, chunk_frames=CHUNK, max_frames=64, beam=2,
        max_len=MAXLEN,
    )
    committed = []
    for start in range(0, T, CHUNK):
        committed += srv.feed(feats[:, start : start + CHUNK])
    final = srv.finalize()
    # Committed prefix must be a prefix of the final hypothesis.
    assert final[: len(committed)] == committed

    gen = UnitGenerator(
        model, params,
        GenerationConfig(beam=2, max_len_a=0.0, max_len_b=MAXLEN),
    )
    offline = gen.generate(feats, np.asarray([T], np.int32))[0][0]["tokens"]
    assert final == offline, (final, offline)


def _tiny_flagship(V=40, decoder_layers=1):
    from mm_s2ut.config import ModelConfig, MultimodalConfig
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    cfg = ModelConfig(
        encoder_embed_dim=D, encoder_ffn_embed_dim=FFN, encoder_layers=LAYERS,
        encoder_attention_heads=HEADS, decoder_embed_dim=D,
        decoder_ffn_embed_dim=FFN, decoder_layers=decoder_layers,
        decoder_attention_heads=HEADS, conv_channels=CONV, vocab_size=V,
        dtype="float32", encoder_causal_attention=True,
        use_flash_attention=False,
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    T = 48
    feats = rng.randn(1, T, 80).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats),
        jnp.full((1,), T, jnp.int32), jnp.zeros((1, 3), jnp.int32),
    )
    return model, params, feats, T


@pytest.mark.slow
@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_prefill_equals_stepwise(kv_dtype):
    """decode_prefill + one step == replaying the same tokens through
    decode_step: the parallel prefill writes the identical cache."""
    from mm_s2ut.infer.beam_search import tile_state_for_beams

    model, params, feats, T = _tiny_flagship(decoder_layers=2)
    enc = model.apply(
        params, jnp.asarray(feats), jnp.full((1,), T, jnp.int32),
        jnp.zeros((1, 3), jnp.int32), method=model.encode,
    )
    MAXLEN, K = 12, 2
    tokens = [2, 7, 9, 5, 11]  # BOS + 4 generated

    def fresh_state():
        st = model.apply(
            params, enc, MAXLEN + 1, kv_dtype, method=model.decode_init
        )
        return tile_state_for_beams(st, K)

    # Reference: step through tokens one by one (all K slots fed the same
    # token — the pre-divergence beam state).
    st = fresh_state()
    logits_ref = None
    for t in tokens:
        tok = jnp.full((K, 1), t, jnp.int32)
        logits_ref, st = model.apply(params, tok, st, method=model.decode_step)

    # Prefill: one parallel pass over tokens[:-1]+pad, then a single step
    # on the last token.
    st2 = fresh_state()
    P = MAXLEN + 1
    ptoks = np.full((1, P), 1, np.int32)
    ptoks[0, : len(tokens)] = tokens
    st2, plogp = model.apply(
        params, jnp.asarray(ptoks), jnp.asarray(len(tokens), jnp.int32),
        st2, method=model.decode_prefill,
    )
    assert int(st2["step"]) == len(tokens) - 1
    tok = jnp.full((K, 1), tokens[-1], jnp.int32)
    logits_pf, _ = model.apply(params, tok, st2, method=model.decode_step)
    # int8: the stepwise path attends to QUANTIZED history while the
    # parallel prefill pass attends to exact history (the written cache
    # rows quantize identically) — logits agree within quantization
    # noise, exactly for full-precision caches.
    tol = 2e-2 if kv_dtype == "int8" else 2e-4
    np.testing.assert_allclose(
        np.asarray(logits_pf), np.asarray(logits_ref), atol=tol, rtol=tol
    )
    assert np.isfinite(float(plogp[0]))


def test_prefix_search_empty_prefix_equals_plain():
    """A BOS-only prefix reproduces the unconstrained search exactly."""
    from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams

    model, params, feats, T = _tiny_flagship()
    enc = model.apply(
        params, jnp.asarray(feats), jnp.full((1,), T, jnp.int32),
        jnp.zeros((1, 3), jnp.int32), method=model.encode,
    )
    MAXLEN, K = 10, 2
    step_fn = lambda t, s: model.apply(params, t, s, method=model.decode_step)

    st = tile_state_for_beams(
        model.apply(params, enc, MAXLEN + 1, None, method=model.decode_init), K
    )
    seqs0, sc0 = beam_search(
        step_fn, st, 1, beam_size=K, max_len=MAXLEN,
        vocab_size=model.cfg.vocab_size,
    )

    st = tile_state_for_beams(
        model.apply(params, enc, MAXLEN + 1, None, method=model.decode_init), K
    )
    ptoks = np.full((1, MAXLEN + 1), 1, np.int32)
    ptoks[0, 0] = 2
    st, plogp = model.apply(
        params, jnp.asarray(ptoks), jnp.asarray(1, jnp.int32), st,
        method=model.decode_prefill,
    )
    seqs1, sc1 = beam_search(
        step_fn, st, 1, beam_size=K, max_len=MAXLEN,
        vocab_size=model.cfg.vocab_size,
        prefix_tokens=jnp.asarray(ptoks),
        prefix_len=jnp.asarray(1, jnp.int32),
        prefix_logp=plogp, max_new=MAXLEN,
    )
    np.testing.assert_array_equal(np.asarray(seqs0), np.asarray(seqs1))
    np.testing.assert_allclose(np.asarray(sc0), np.asarray(sc1), atol=1e-5)


def test_streaming_s2st_prefix_reuse():
    """prefix_reuse=True: committed stays a prefix of the final
    hypothesis and finalize still equals offline decoding."""
    from mm_s2ut.config import GenerationConfig
    from mm_s2ut.infer.generator import UnitGenerator
    from mm_s2ut.infer.streaming import StreamingS2ST

    model, params, feats, T = _tiny_flagship()
    CHUNK, MAXLEN = 16, 10
    srv = StreamingS2ST(
        model, params, chunk_frames=CHUNK, max_frames=64, beam=2,
        max_len=MAXLEN, prefix_reuse=True, max_new_tokens=6,
    )
    committed = []
    for start in range(0, T, CHUNK):
        committed += srv.feed(feats[:, start : start + CHUNK])
    final = srv.finalize()
    assert final[: len(committed)] == committed

    gen = UnitGenerator(
        model, params,
        GenerationConfig(beam=2, max_len_a=0.0, max_len_b=MAXLEN),
    )
    offline = gen.generate(feats, np.asarray([T], np.int32))[0][0]["tokens"]
    assert final == offline, (final, offline)


@pytest.mark.slow
def test_streaming_session_reset_reuses_programs():
    """srv.reset() between utterances gives the same committed/final
    results as a fresh session (compiled programs are reused, state is
    not leaked across streams)."""
    from mm_s2ut.infer.streaming import StreamingS2ST

    model, params, feats, T = _tiny_flagship()
    CHUNK, MAXLEN = 16, 10
    rng = np.random.RandomState(7)
    feats2 = rng.randn(1, T, 80).astype(np.float32)

    def stream(srv, f):
        committed = []
        for start in range(0, T, CHUNK):
            committed += srv.feed(f[:, start : start + CHUNK])
        return committed, srv.finalize()

    srv = StreamingS2ST(
        model, params, chunk_frames=CHUNK, max_frames=64, beam=2,
        max_len=MAXLEN, prefix_reuse=True, max_new_tokens=6,
    )
    got1 = stream(srv, feats)
    srv.reset()
    got2 = stream(srv, feats2)
    srv.reset()
    got1_again = stream(srv, feats)

    fresh = StreamingS2ST(
        model, params, chunk_frames=CHUNK, max_frames=64, beam=2,
        max_len=MAXLEN, prefix_reuse=True, max_new_tokens=6,
    )
    want2 = stream(fresh, feats2)
    assert got2 == want2
    assert got1 == got1_again


@pytest.mark.slow
def test_stream_cli_end_to_end(tmp_path):
    """Train a tiny causal-encoder checkpoint, run the streaming CLI on a
    wav, and check the streamed units equal offline inference's units."""
    from mm_s2ut import registry
    from mm_s2ut.cli.stream import main as stream_main
    from mm_s2ut.config import (
        Config, DataConfig, GenerationConfig, MeshConfig, ModelConfig,
        MultimodalConfig, TrainConfig,
    )
    from mm_s2ut.data.audio_io import write_wav
    from mm_s2ut.data.manifest import ManifestRow, write_manifest
    from mm_s2ut.inference import main as infer_main

    root = tmp_path / "corpus"
    root.mkdir()
    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    for i in range(3):
        length = sr // 4 + 731 * i  # not a chunk multiple: short-tail path
        write_wav(root / f"{i + 1}.wav", (0.3 * rng.randn(length)).astype(np.float32), sr)
        units = " ".join(str(u) for u in rng.randint(0, 30, 6))
        rows.append(ManifestRow(str(i), f"{i + 1}.wav", length, units, 6))
    write_manifest(root / "train.tsv", rows)

    cfg = Config(
        model=ModelConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, conv_channels=16, dtype="float32",
            encoder_causal_attention=True, use_flash_attention=False,
            multimodal=MultimodalConfig(multimodal_attention_type=None),
        ),
        data=DataConfig(
            data_root=str(root), audio_root=str(root), target_code_size=30,
            max_tokens=400, num_buckets=1, standardize_audio=False,
        ),
        train=TrainConfig(
            update_freq=1, warmup_updates=2, lr=1e-3,
            save_dir=str(root / "ckpt"),
        ),
        generation=GenerationConfig(beam=2, max_len_a=0, max_len_b=10),
        mesh=MeshConfig(data=1),
    )
    task = registry.get_task("multimodal_speech_to_speech")(cfg)
    trainer = task.build_trainer()
    for batch in task.batch_iterator("train", epoch=0):
        trainer.train_batch(batch)
    trainer.save_checkpoint({"loss": 1.0})

    from tests.test_inference_cli import _tiny_vocoder

    voc_ckpt, voc_cfg = _tiny_vocoder(tmp_path)
    out_s = tmp_path / "stream_out"
    rc = stream_main([
        "--model_path", str(root / "ckpt"),
        "--audio_path", str(root / "2.wav"),
        "--output_dir", str(out_s),
        "--chunk-ms", "160",
        "--vocoder_path", str(voc_ckpt),
        "--vocoder_cfg", str(voc_cfg),
    ])
    assert rc == 0
    streamed = (out_s / "2.unit").read_text().split()

    # The streamed wav equals an exact-length offline vocode of the same
    # units (PCM16 write/read quantization bounds the tolerance).
    from mm_s2ut.data.audio_io import get_waveform as _gw
    from mm_s2ut.models.hifigan import (
        CodeHiFiGAN, HiFiGANConfig, load_fairseq_checkpoint,
    )

    vcfg = HiFiGANConfig.from_json(voc_cfg)
    voc_vars = load_fairseq_checkpoint(voc_ckpt, vcfg)
    u = np.asarray([[int(x) for x in streamed]], np.int32)
    want_wav, n = CodeHiFiGAN(vcfg, max_frames=u.shape[1]).apply(
        voc_vars, jnp.asarray(u), jnp.asarray([u.shape[1]])
    )
    got_wav, _ = _gw(str(out_s / "2_pred.wav"))
    np.testing.assert_allclose(
        got_wav, np.asarray(want_wav)[0, : int(np.asarray(n)[0])], atol=2e-4
    )

    out_o = tmp_path / "offline_out"
    rc = infer_main([
        "--model_path", str(root / "ckpt"),
        "--audio_path", str(root / "2.wav"),
        "--output_dir", str(out_o),
    ])
    assert rc == 0
    offline = (out_o / "2.unit").read_text().split()
    assert streamed == offline, (streamed, offline)


def test_streaming_s2st_decode_every():
    """decode_every=2: intermediate feeds commit nothing (encoder-only),
    finalize still equals the offline decode, and committed stays a
    prefix of the final hypothesis."""
    from mm_s2ut.config import GenerationConfig, ModelConfig, MultimodalConfig
    from mm_s2ut.infer.generator import UnitGenerator
    from mm_s2ut.infer.streaming import StreamingS2ST
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    V = 40
    cfg = ModelConfig(
        encoder_embed_dim=D, encoder_ffn_embed_dim=FFN, encoder_layers=LAYERS,
        encoder_attention_heads=HEADS, decoder_embed_dim=D,
        decoder_ffn_embed_dim=FFN, decoder_layers=1,
        decoder_attention_heads=HEADS, conv_channels=CONV, vocab_size=V,
        dtype="float32", encoder_causal_attention=True,
        use_flash_attention=False,
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    T, CHUNK = 48, 16
    feats = rng.randn(1, T, 80).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats),
        jnp.full((1,), T, jnp.int32), jnp.zeros((1, 3), jnp.int32),
    )
    MAXLEN = 10
    srv = StreamingS2ST(
        model, params, chunk_frames=CHUNK, max_frames=64, beam=2,
        max_len=MAXLEN, decode_every=2,
    )
    commits = []
    for start in range(0, T, CHUNK):
        commits.append(srv.feed(feats[:, start : start + CHUNK]))
    # Feeds 1 and 3 skip the search entirely.
    assert commits[0] == [] and commits[2] == []
    committed = [u for c in commits for u in c]
    final = srv.finalize()
    assert final[: len(committed)] == committed

    gen = UnitGenerator(
        model, params,
        GenerationConfig(beam=2, max_len_a=0.0, max_len_b=MAXLEN),
    )
    offline = gen.generate(feats, np.asarray([T], np.int32))[0][0]["tokens"]
    assert final == offline
