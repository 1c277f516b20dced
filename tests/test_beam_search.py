"""Beam search correctness: jitted fixed-shape search vs a brute-force
Python reference with fairseq scoring semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_generator_aot_roundtrip(tmp_path):
    """aot_save → fresh generator → aot_load: the deserialized
    executables produce the same hypotheses as the jitted path, with no
    tracing of the search in the loading process path."""
    import jax
    import jax.numpy as jnp

    from mm_s2ut.config import GenerationConfig, ModelConfig, MultimodalConfig
    from mm_s2ut.infer.generator import UnitGenerator
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    cfg = ModelConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        encoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=1,
        decoder_attention_heads=2, conv_channels=16, vocab_size=40,
        dtype="float32", use_flash_attention=False,
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    B, T = 2, 48
    feats = rng.randn(B, T, 80).astype(np.float32)
    lengths = np.full((B,), T, np.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(lengths),
        jnp.zeros((B, 3), jnp.int32),
    )
    gcfg = GenerationConfig(beam=2, max_len_a=0.0, max_len_b=8)

    gen = UnitGenerator(model, params, gcfg)
    want = gen.generate(feats, lengths)
    gen.aot_save(tmp_path, B, T)

    gen2 = UnitGenerator(model, params, gcfg)
    assert gen2.aot_load(tmp_path) == 1
    got = gen2.generate(feats, lengths)
    assert [h["tokens"] for h in got[0]] == [h["tokens"] for h in want[0]]
    assert [h["tokens"] for h in got[1]] == [h["tokens"] for h in want[1]]
    # A non-matching shape falls back to the jitted path.
    other = gen2.generate(feats[:, : T - 8], lengths - 8)
    assert len(other) == B

    # A generator with a different beam must NOT pick up the artifact.
    gen3 = UnitGenerator(
        model, params, GenerationConfig(beam=3, max_len_a=0.0, max_len_b=8)
    )
    assert gen3.aot_load(tmp_path) == 0

from mm_s2ut.infer.beam_search import beam_search, tile_state_for_beams, trim_hypothesis
from mm_s2ut.models.decoder import UnitDecoder

V, EOS, BOS, PAD = 12, 2, 2, 1


def make_decoder():
    dec = UnitDecoder(vocab_size=V, embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2)
    enc_out = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16))
    enc_mask = jnp.zeros((1, 4), bool)
    tokens = jnp.zeros((1, 3), jnp.int32)
    params = dec.init(jax.random.PRNGKey(7), tokens, enc_out, enc_mask)
    return dec, params, enc_out, enc_mask


def brute_force(dec, params, enc_out, enc_mask, K, max_len, lenpen=1.0):
    finished = []
    alive = [([BOS], 0.0)]
    for step in range(max_len):
        cands = []
        for toks, s in alive:
            full = dec.apply(params, jnp.asarray([toks]), enc_out, enc_mask)
            logp = np.asarray(jax.nn.log_softmax(full[0, -1].astype(jnp.float32)))
            if step + 1 >= max_len:  # fairseq: budget forces EOS
                for v in range(V):
                    cands.append((toks + [v], s + (0.0 if v == EOS else -1e7)))
                continue
            for v in range(V):
                cands.append((toks + [v], s + float(logp[v])))
        cands.sort(key=lambda x: -x[1])
        cands = cands[: 2 * K]
        new_alive = []
        for toks, s in cands:
            if toks[-1] == EOS:
                finished.append((toks, s / (step + 1) ** lenpen))
            elif len(new_alive) < K:
                new_alive.append((toks, s))
        alive = new_alive
        if not alive:
            break
    finished.sort(key=lambda x: -x[1])
    return finished[:K]


@pytest.mark.slow
def test_beam_matches_brute_force():
    dec, params, enc_out, enc_mask = make_decoder()
    K, max_len = 3, 8

    state = dec.apply(params, enc_out, enc_mask, max_len + 1, method=UnitDecoder.init_state)
    state = tile_state_for_beams(state, K)

    def step_fn(tokens, st):
        return dec.apply(params, tokens, st, method=UnitDecoder.step)

    seqs, scores = beam_search(
        step_fn, state, 1, beam_size=K, max_len=max_len,
        eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
    )
    got = trim_hypothesis(np.asarray(seqs)[0, 0], EOS, PAD)
    want = brute_force(dec, params, enc_out, enc_mask, K, max_len)
    want_tokens = want[0][0][1:-1]  # strip BOS and EOS
    assert got == want_tokens, (got, want_tokens)
    assert abs(float(scores[0, 0]) - want[0][1]) < 1e-3


def test_beam_wider_than_half_vocab_matches_brute_force():
    """K with V < 2K (here K=8, V=12): the two-stage top-2K must clamp its
    stage-1 k to V (top_k with k > row length is a trace error) while
    staying exhaustive — a beam contributes at most V candidates."""
    dec, params, enc_out, enc_mask = make_decoder()
    K, max_len = 8, 6

    state = dec.apply(params, enc_out, enc_mask, max_len + 1, method=UnitDecoder.init_state)
    state = tile_state_for_beams(state, K)

    def step_fn(tokens, st):
        return dec.apply(params, tokens, st, method=UnitDecoder.step)

    seqs, scores = beam_search(
        step_fn, state, 1, beam_size=K, max_len=max_len,
        eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
    )
    got = trim_hypothesis(np.asarray(seqs)[0, 0], EOS, PAD)
    want = brute_force(dec, params, enc_out, enc_mask, K, max_len)
    want_tokens = want[0][0][1:-1]
    assert got == want_tokens, (got, want_tokens)
    assert abs(float(scores[0, 0]) - want[0][1]) < 1e-3


def test_beam_batch_and_padding():
    dec, params, _, _ = make_decoder()
    K, max_len, B = 2, 6, 3
    enc_out = jax.random.normal(jax.random.PRNGKey(3), (B, 5, 16))
    enc_mask = jnp.zeros((B, 5), bool).at[2, 3:].set(True)
    state = dec.apply(params, enc_out, enc_mask, max_len + 1, method=UnitDecoder.init_state)
    state = tile_state_for_beams(state, K)

    def step_fn(tokens, st):
        return dec.apply(params, tokens, st, method=UnitDecoder.step)

    seqs, scores = beam_search(
        step_fn, state, B, beam_size=K, max_len=max_len,
        eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
    )
    assert seqs.shape == (B, K, max_len)
    assert scores.shape == (B, K)
    s = np.asarray(scores)
    assert (s[:, 0] + 1e-6 >= s[:, 1]).all()  # sorted best-first
    # Batched search equals single-example search for element 0.
    state1 = dec.apply(
        params, enc_out[:1], enc_mask[:1], max_len + 1, method=UnitDecoder.init_state
    )
    state1 = tile_state_for_beams(state1, K)
    seqs1, scores1 = beam_search(
        step_fn, state1, 1, beam_size=K, max_len=max_len,
        eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
    )
    np.testing.assert_array_equal(np.asarray(seqs)[0], np.asarray(seqs1)[0])
    np.testing.assert_allclose(np.asarray(scores)[0], np.asarray(scores1)[0], atol=1e-5)


def test_int8_kv_cache_matches_bf16_decode():
    """int8 decode cache (per-column symmetric quantization): the beam
    search runs the same search as the exact cache and lands on the same
    tokens with near-identical scores on a well-separated toy model."""
    dec, params, enc_out, enc_mask = make_decoder()
    K, max_len = 3, 8

    def run(kv_dtype):
        state = dec.apply(
            params, enc_out, enc_mask, max_len + 1,
            method=UnitDecoder.init_state, kv_dtype=kv_dtype,
        )
        state = tile_state_for_beams(state, K)

        def step_fn(tokens, st):
            return dec.apply(params, tokens, st, method=UnitDecoder.step)

        return beam_search(
            step_fn, state, 1, beam_size=K, max_len=max_len,
            eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        )

    seqs_fp, scores_fp = run(None)
    seqs_q, scores_q = run("int8")
    assert trim_hypothesis(np.asarray(seqs_q)[0, 0], EOS, PAD) == \
        trim_hypothesis(np.asarray(seqs_fp)[0, 0], EOS, PAD)
    np.testing.assert_allclose(
        np.asarray(scores_q), np.asarray(scores_fp), atol=5e-2
    )


def test_int8_kv_cache_across_segment_growth():
    """The segmented cache growth (64 → 128 → …) must carry the int8
    dequant scale buffers along with self_kv (regression: scales stayed
    at full size while the cache was sliced, shape-mismatching the
    kernel)."""
    dec, params, enc_out, enc_mask = make_decoder()
    K, max_len = 2, 70  # crosses the 64-entry first segment

    def run(kv_dtype):
        state = dec.apply(
            params, enc_out, enc_mask, max_len + 1,
            method=UnitDecoder.init_state, kv_dtype=kv_dtype,
        )
        state = tile_state_for_beams(state, K)

        def step_fn(tokens, st):
            return dec.apply(params, tokens, st, method=UnitDecoder.step)

        return beam_search(
            step_fn, state, 1, beam_size=K, max_len=max_len,
            eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        )

    seqs_q, scores_q = run("int8")
    seqs_fp, scores_fp = run(None)
    assert np.isfinite(np.asarray(scores_q)).all()
    np.testing.assert_allclose(
        np.asarray(scores_q), np.asarray(scores_fp), atol=6e-2
    )


def test_int4_kv_cache_matches_bf16_decode():
    """int4 nibble-packed decode cache: same search decisions as the
    exact cache on a well-separated toy model (scores agree to int4
    precision)."""
    dec, params, enc_out, enc_mask = make_decoder()
    K, max_len = 3, 8

    def run(kv_dtype):
        state = dec.apply(
            params, enc_out, enc_mask, max_len + 1,
            method=UnitDecoder.init_state, kv_dtype=kv_dtype,
        )
        state = tile_state_for_beams(state, K)

        def step_fn(tokens, st):
            return dec.apply(params, tokens, st, method=UnitDecoder.step)

        return beam_search(
            step_fn, state, 1, beam_size=K, max_len=max_len,
            eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        )

    seqs_fp, scores_fp = run(None)
    seqs_q, scores_q = run("int4")
    assert trim_hypothesis(np.asarray(seqs_q)[0, 0], EOS, PAD) == \
        trim_hypothesis(np.asarray(seqs_fp)[0, 0], EOS, PAD)
    np.testing.assert_allclose(
        np.asarray(scores_q), np.asarray(scores_fp), atol=2e-1
    )


def test_int4_kv_cache_across_segment_growth():
    """Segment growth re-packs the nibble cache for the moved half
    boundary (i4_regrow) — scores stay finite and close to the exact
    cache across the 64-entry boundary; odd max_len exercises the
    round-to-even allocation."""
    dec, params, enc_out, enc_mask = make_decoder()
    K, max_len = 2, 70  # crosses the 64-entry first segment

    def run(kv_dtype):
        state = dec.apply(
            params, enc_out, enc_mask, max_len + 1,  # 71 → rounds to 72
            method=UnitDecoder.init_state, kv_dtype=kv_dtype,
        )
        state = tile_state_for_beams(state, K)

        def step_fn(tokens, st):
            return dec.apply(params, tokens, st, method=UnitDecoder.step)

        return beam_search(
            step_fn, state, 1, beam_size=K, max_len=max_len,
            eos_id=EOS, bos_id=BOS, pad_id=PAD, vocab_size=V,
        )

    seqs_q, scores_q = run("int4")
    seqs_fp, scores_fp = run(None)
    assert np.isfinite(np.asarray(scores_q)).all()
    np.testing.assert_allclose(
        np.asarray(scores_q), np.asarray(scores_fp), atol=2e-1
    )


@pytest.mark.slow
def test_unit_generator_ensemble_decoding():
    """Logit-ensemble decoding (fairseq load_model_ensemble semantics):
    an ensemble of [p, p] is token- and score-identical to single-p
    decode (mean of identical prob distributions), and a genuine 2-model
    ensemble runs end-to-end and stays properly normalized."""
    from mm_s2ut.config import GenerationConfig, ModelConfig, MultimodalConfig
    from mm_s2ut.infer.generator import UnitGenerator
    from mm_s2ut.models.mm_s2ut import MMS2UTModel

    cfg = ModelConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        encoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=1,
        decoder_attention_heads=2, conv_channels=16, vocab_size=V,
        dtype="float32",
        multimodal=MultimodalConfig(multimodal_attention_type=None),
    )
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 32, 80).astype(np.float32)
    lens = np.asarray([32, 24], np.int32)
    p1 = model.init(
        jax.random.PRNGKey(7), jnp.asarray(feats), jnp.asarray(lens),
        jnp.zeros((2, 3), jnp.int32),
    )
    p2 = model.init(
        jax.random.PRNGKey(8), jnp.asarray(feats), jnp.asarray(lens),
        jnp.zeros((2, 3), jnp.int32),
    )
    gcfg = GenerationConfig(beam=2, max_len_a=0.0, max_len_b=8)

    single = UnitGenerator(model, p1, gcfg).generate(feats, lens)
    dup = UnitGenerator(model, [p1, p1], gcfg).generate(feats, lens)
    for s, d in zip(single, dup):
        for hs, hd in zip(s, d):
            assert hs["tokens"] == hd["tokens"]
            np.testing.assert_allclose(hs["score"], hd["score"], atol=1e-4)

    mixed = UnitGenerator(model, [p1, p2], gcfg).generate(feats, lens)
    assert len(mixed) == 2 and len(mixed[0]) == 2
    assert all(np.isfinite(h["score"]) for hyps in mixed for h in hyps)
