"""Continuous-batching server vs offline beam search: per-utterance
results must be identical (chunking/slot-sharing/ring reuse change
scheduling, not math)."""
import pytest

pytestmark = pytest.mark.slow
import numpy as np

import jax
import jax.numpy as jnp

from mm_s2ut.config import ModelConfig, MultimodalConfig
from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams
from mm_s2ut.infer.serving import ContinuousServer, Request
from mm_s2ut.models.mm_s2ut import MMS2UTModel

V, EOS, BOS, PAD = 40, 2, 2, 1
K, MAX_LEN = 2, 12


def _model(sharpen=True):
    cfg = ModelConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        encoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=2,
        decoder_attention_heads=2, conv_channels=16, vocab_size=V,
        dtype="float32",
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 32, 80), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(7), feats, jnp.full((1,), 32, jnp.int32),
        jnp.zeros((1, 3), jnp.int32),
    )
    if sharpen:
        # Sharpen the (shared in/out) unit embedding: the server's chunked
        # program and the offline search are DIFFERENT compiled programs,
        # so random-weight near-tie argmaxes can legitimately flip on f32
        # fusion/rounding differences (observed once as an order-dependent
        # suite flake). 3x logit separation makes the equality assertions
        # test scheduling, not tie-breaking. Tests that NEED near-uniform
        # logits (budget/forced-EOS behavior) pass sharpen=False.
        emb = params["params"]["decoder"]["embed"]["embed_tokens"]["embedding"]
        params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        params["params"]["decoder"]["embed"]["embed_tokens"]["embedding"] = emb * 3.0
    return model, params


def _offline(model, params, feats, length, enc_frames=64):
    """Offline reference: single-utterance padded encode + beam search."""
    f = np.zeros((1, enc_frames, 80), np.float32)
    f[0, : feats.shape[0]] = feats
    enc = model.apply(
        params, jnp.asarray(f), jnp.asarray([length], np.int32), (), (), None,
        deterministic=True, method=model.encode,
    )
    state = model.apply(params, enc, MAX_LEN + 1, method=model.decode_init)
    state = tile_state_for_beams(state, K)
    seqs, scores = beam_search(
        lambda t, s: model.apply(params, t, s, method=model.decode_step),
        state, 1, beam_size=K, max_len=MAX_LEN,
        eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
    )
    toks = [int(t) for t in np.asarray(seqs)[0, 0]]
    if EOS in toks:
        toks = toks[: toks.index(EOS)]
    return toks, float(scores[0, 0])


@pytest.mark.parametrize("admit_width,sync_every", [(None, 1), (1, 1), (None, 3)])
def test_server_matches_offline_beam_search(admit_width, sync_every):
    """admit_width=1 forces multi-wave bounded admission (each wave
    encodes/transfers one row and scatters it into its slot);
    sync_every=3 exercises skipped report fetches — finishers must
    survive to a later report via the level-triggered finished flag."""
    model, params = _model()
    rng = np.random.RandomState(3)
    n_req = 5
    reqs = []
    for i in range(n_req):
        T = 24 + 8 * (i % 3)
        reqs.append(Request(uid=i, features=rng.randn(T, 80).astype(np.float32), length=T))

    srv = ContinuousServer(
        model, params, slots=2, beam_size=K, ring=32, chunk=5,
        enc_frames=64, eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        max_len_a=0.0, max_len_b=MAX_LEN, admit_width=admit_width,
        sync_every=sync_every,
    )
    results = {r.uid: r for r in srv.run(reqs)}
    assert set(results) == set(range(n_req))

    for req in reqs:
        want_toks, want_score = _offline(model, params, req.features, req.length)
        got = results[req.uid]
        assert got.tokens == want_toks, (req.uid, got.tokens, want_toks)
        np.testing.assert_allclose(got.score, want_score, atol=1e-4)


def test_server_slot_reuse_exceeds_ring():
    """Enough sequential admissions that ring positions wrap several times."""
    model, params = _model()
    rng = np.random.RandomState(5)
    reqs = [
        Request(uid=i, features=rng.randn(24, 80).astype(np.float32), length=24)
        for i in range(7)
    ]
    srv = ContinuousServer(
        model, params, slots=1, beam_size=K, ring=16, chunk=4,
        enc_frames=64, eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        max_len_a=0.0, max_len_b=MAX_LEN,
    )
    results = {r.uid: r for r in srv.run(reqs)}
    assert len(results) == 7
    for req in reqs:
        want_toks, want_score = _offline(model, params, req.features, req.length)
        got = results[req.uid]
        assert got.tokens == want_toks
        np.testing.assert_allclose(got.score, want_score, atol=1e-4)


def test_server_with_image_fusion_matches_offline():
    cfg = ModelConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        encoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=1,
        decoder_attention_heads=2, conv_channels=16, vocab_size=V,
        dtype="float32",
        multimodal=MultimodalConfig(
            image_feat_dim=[16],
            multimodal_attention_type="selective_attention",
        ),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    feats1 = jnp.asarray(rng.randn(1, 32, 80), jnp.float32)
    img1 = jnp.asarray(rng.randn(1, 6, 16), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(7), feats1, jnp.full((1,), 32, jnp.int32),
        jnp.zeros((1, 3), jnp.int32), imgs_list=(img1,),
        img_masks_list=(jnp.zeros((1, 6), bool),),
    )

    reqs = []
    for i in range(3):
        T = 24 + 8 * (i % 2)
        reqs.append(Request(
            uid=i, features=rng.randn(T, 80).astype(np.float32), length=T,
            imgs=(rng.randn(6, 16).astype(np.float32),),
            img_masks=(np.zeros(6, bool),),
        ))
    srv = ContinuousServer(
        model, params, slots=2, beam_size=K, ring=32, chunk=4,
        enc_frames=64, eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        max_len_a=0.0, max_len_b=MAX_LEN,
        n_img_sources=1, img_shapes=((6, 16),),
    )
    results = {r.uid: r for r in srv.run(reqs)}

    for req in reqs:
        f = np.zeros((1, 64, 80), np.float32)
        f[0, : req.features.shape[0]] = req.features
        enc = model.apply(
            params, jnp.asarray(f), jnp.asarray([req.length], np.int32),
            (jnp.asarray(req.imgs[0][None]),),
            (jnp.asarray(req.img_masks[0][None]),), None,
            deterministic=True, method=model.encode,
        )
        state = model.apply(params, enc, MAX_LEN + 1, method=model.decode_init)
        state = tile_state_for_beams(state, K)
        seqs, scores = beam_search(
            lambda t, s: model.apply(params, t, s, method=model.decode_step),
            state, 1, beam_size=K, max_len=MAX_LEN,
            eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        )
        toks = [int(t) for t in np.asarray(seqs)[0, 0]]
        if EOS in toks:
            toks = toks[: toks.index(EOS)]
        got = results[req.uid]
        assert got.tokens == toks, (req.uid, got.tokens, toks)
        np.testing.assert_allclose(got.score, float(scores[0, 0]), atol=1e-4)


def test_admit_preserves_quantized_cross_cache():
    """Admission must re-derive the cross cache at the server's
    kv_cache_dtype and merge the quantization scales: a float re-derivation
    silently promotes the int8 cache (losing the bandwidth win) and changes
    the state pytree, retracing _decode_chunk after the first admit."""
    model, params = _model()
    srv = ContinuousServer(
        model, params, slots=2, beam_size=K, ring=16, chunk=4,
        enc_frames=64, eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        max_len_a=0.0, max_len_b=MAX_LEN, kv_cache_dtype="int8",
    )
    state = srv.init_state(params)
    before = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), state)

    rng = np.random.RandomState(11)
    feats = jnp.asarray(rng.randn(2, 64, 80), jnp.float32)
    enc_out, enc_mask = srv._encode(
        params, feats, jnp.asarray([40, 24], np.int32), (), ()
    )
    st2 = srv._admit(
        params, state, jnp.asarray([0, 1], np.int32),
        jnp.asarray([True, False]), enc_out, enc_mask,
        jnp.asarray([40, 24], np.int32),
    )

    for c in st2["cross"]:
        assert c["kv"].dtype == jnp.int8, c["kv"].dtype
        assert "sk" in c and "sv" in c
    # Admitted slot rows carry real (non-zero) quantized values + scales.
    assert np.abs(np.asarray(st2["cross"][0]["kv"][0])).sum() > 0
    assert np.asarray(st2["cross"][0]["sk"][0]).sum() > 0
    # The state pytree (structure + shapes + dtypes) is admit-invariant,
    # so _decode_chunk compiles exactly once.
    after = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), st2)
    assert jax.tree_util.tree_structure(before) == jax.tree_util.tree_structure(after)
    assert jax.tree_util.tree_leaves(before) == jax.tree_util.tree_leaves(after)


def test_server_int4_ring_wrap_matches_offline_int4():
    """int4 nibble-packed ring: the read-merge-write nibble updates must
    preserve live data in the OTHER half's nibbles across ring wraps —
    server results equal the offline int4 beam search per utterance."""
    model, params = _model()
    rng = np.random.RandomState(9)
    reqs = [
        Request(uid=i, features=rng.randn(24, 80).astype(np.float32), length=24)
        for i in range(5)
    ]
    srv = ContinuousServer(
        model, params, slots=1, beam_size=K, ring=16, chunk=4,
        enc_frames=64, eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        max_len_a=0.0, max_len_b=MAX_LEN, kv_cache_dtype="int4",
    )
    results = {r.uid: r for r in srv.run(reqs)}
    assert len(results) == 5

    def _offline_int4(feats, length, enc_frames=64):
        f = np.zeros((1, enc_frames, 80), np.float32)
        f[0, : feats.shape[0]] = feats
        enc = model.apply(
            params, jnp.asarray(f), jnp.asarray([length], np.int32), (), (), None,
            deterministic=True, method=model.encode,
        )
        state = model.apply(
            params, enc, MAX_LEN + 1, method=model.decode_init, kv_dtype="int4"
        )
        state = tile_state_for_beams(state, K)
        seqs, scores = beam_search(
            lambda t, s: model.apply(params, t, s, method=model.decode_step),
            state, 1, beam_size=K, max_len=MAX_LEN,
            eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        )
        toks = [int(t) for t in np.asarray(seqs)[0, 0]]
        if EOS in toks:
            toks = toks[: toks.index(EOS)]
        return toks, float(scores[0, 0])

    for req in reqs:
        want_toks, want_score = _offline_int4(req.features, req.length)
        got = results[req.uid]
        assert got.tokens == want_toks, (req.uid, got.tokens, want_toks)
        # Scores are NOT bitwise-comparable under a quantized cache: the
        # server and offline programs compute the same math with different
        # fusion/layout, and ulp-level input differences flip round()
        # decisions in the per-column quantizer (one flip ≈ one quantum).
        # Measured: exact-cache server-vs-offline delta 6e-8; int8/int4
        # ~5e-4. Tokens must still agree exactly.
        np.testing.assert_allclose(got.score, want_score, atol=3e-3)


def test_server_xm_waveform_requests_match_offline():
    """enc_feat_dim=None serves raw-waveform models (XM/wav2vec2 front
    ends): XM shares the UnitDecoder serve_step/ring contract, so per-
    utterance results must equal the offline beam search."""
    from mm_s2ut.models.mm_xm import MMXMTransformerModel
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config

    w2v = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=24, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=48, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    cfg = ModelConfig(
        decoder_embed_dim=32, decoder_ffn_embed_dim=64, decoder_layers=1,
        decoder_attention_heads=2, vocab_size=V, dtype="float32",
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMXMTransformerModel(cfg, w2v_cfg=w2v)
    rng = np.random.RandomState(0)
    wav0 = jnp.asarray(rng.randn(1, 1600).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), wav0, jnp.asarray([1600], np.int32),
        jnp.zeros((1, 3), jnp.int32),
    )

    reqs = [
        Request(
            uid=i, features=rng.randn(1200 + 200 * (i % 2)).astype(np.float32),
            length=1200 + 200 * (i % 2),
        )
        for i in range(3)
    ]
    srv = ContinuousServer(
        model, params, slots=2, beam_size=K, ring=32, chunk=4,
        enc_frames=1600, eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        max_len_a=0.0, max_len_b=MAX_LEN, enc_feat_dim=None, admit_width=1,
    )
    results = {r.uid: r for r in srv.run(reqs)}

    for req in reqs:
        w = np.zeros((1, 1600), np.float32)
        w[0, : req.length] = req.features[: req.length]
        enc = model.apply(
            params, jnp.asarray(w), jnp.asarray([req.length], np.int32),
            (), (), deterministic=True, method=model.encode,
        )
        state = model.apply(params, enc, MAX_LEN + 1, method=model.decode_init)
        state = tile_state_for_beams(state, K)
        seqs, scores = beam_search(
            lambda t, s: model.apply(params, t, s, method=model.decode_step),
            state, 1, beam_size=K, max_len=MAX_LEN,
            eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        )
        toks = [int(t) for t in np.asarray(seqs)[0, 0]]
        if EOS in toks:
            toks = toks[: toks.index(EOS)]
        got = results[req.uid]
        assert got.tokens == toks, (req.uid, got.tokens, toks)
        np.testing.assert_allclose(got.score, float(scores[0, 0]), atol=1e-4)


def test_slot_budget_uses_raw_source_frames():
    """max_len_a applies to RAW source frames (Request.length), matching
    the offline UnitGenerator's rule — regression: the budget was computed
    from the 4x conv-subsampled encoder mask, forcing EOS ~4x early."""
    model, params = _model(sharpen=False)
    rng = np.random.RandomState(7)
    # Budgets: 0.25·32 = 8 and 0.25·48 = 12 decode steps.
    reqs = [
        Request(uid=0, features=rng.randn(32, 80).astype(np.float32), length=32),
        Request(uid=1, features=rng.randn(48, 80).astype(np.float32), length=48),
    ]
    srv = ContinuousServer(
        model, params, slots=2, beam_size=K, ring=32, chunk=4,
        enc_frames=64, eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        max_len_a=0.25, max_len_b=0,
    )
    results = {r.uid: r for r in srv.run(reqs)}
    # Random weights never emit EOS naturally, so each hypothesis runs to
    # its forced-EOS budget: len(tokens) == a·src_frames − 1 (EOS stripped).
    assert len(results[0].tokens) == 8 - 1, results[0].tokens
    assert len(results[1].tokens) == 12 - 1, results[1].tokens
