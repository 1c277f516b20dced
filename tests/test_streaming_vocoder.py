"""Streaming vocoder: chunked unit→wav synthesis must equal one
exact-length offline CodeHiFiGAN forward over the full unit sequence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_s2ut.infer.streaming_vocoder import (
    StreamingVocoderSession, generator_halo_samples,
)
from mm_s2ut.models.hifigan import CodeHiFiGAN, HiFiGANConfig

SMALL = HiFiGANConfig(
    num_embeddings=20,
    embedding_dim=8,
    model_in_dim=8,
    upsample_initial_channel=16,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 2)),
    dur_prediction=True,
    var_pred_hidden_dim=8,
)


def _offline(cfg, params, units):
    """Exact-length offline vocode: (total_frames·hop,) samples."""
    u = jnp.asarray(np.asarray(units, np.int32)[None])
    lens = jnp.asarray([len(units)], np.int32)
    model = CodeHiFiGAN(cfg, max_frames=8)  # budget replaced below
    dur = model.apply(params, u, lens, method=CodeHiFiGAN.unit_durations)
    total = int(np.asarray(dur).sum())
    wav, n = CodeHiFiGAN(cfg, max_frames=total).apply(params, u, lens)
    assert int(np.asarray(n)[0]) == total * cfg.hop_length
    return np.asarray(wav)[0]


def test_halo_bound_positive_and_modest():
    h = generator_halo_samples(SMALL)
    assert 0 < h < 100 * SMALL.hop_length


@pytest.mark.parametrize("dur_pred", [True, False])
@pytest.mark.parametrize("chunk", [1, 3, 17])
def test_streamed_equals_offline(dur_pred, chunk):
    cfg = HiFiGANConfig(**{**SMALL.__dict__, "dur_prediction": dur_pred})
    rng = np.random.RandomState(0)
    units = rng.randint(0, cfg.num_embeddings, 40).tolist()
    model = CodeHiFiGAN(cfg, max_frames=8)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray([units[:4]], jnp.int32),
        jnp.asarray([4], jnp.int32),
    )
    want = _offline(cfg, params, units)

    sess = StreamingVocoderSession(cfg, params, emit_frames=8, max_units=64)
    got = []
    for i in range(0, len(units), chunk):
        got.append(sess.feed(units[i : i + chunk]))
    got.append(sess.finalize())
    got = np.concatenate(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_short_stream_single_window():
    """A stream shorter than one window takes the exact-length tail path."""
    rng = np.random.RandomState(1)
    units = rng.randint(0, SMALL.num_embeddings, 3).tolist()
    model = CodeHiFiGAN(SMALL, max_frames=8)
    params = model.init(
        jax.random.PRNGKey(1), jnp.asarray([units], jnp.int32),
        jnp.asarray([len(units)], jnp.int32),
    )
    want = _offline(SMALL, params, units)
    sess = StreamingVocoderSession(SMALL, params, emit_frames=64, max_units=16)
    got = np.concatenate([sess.feed(units), sess.finalize()])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_padded_duration_prediction_matches_exact_length():
    """Durations from a padded batch equal per-utterance exact-length
    durations (the predictor masks padding before every conv)."""
    rng = np.random.RandomState(2)
    units = rng.randint(0, SMALL.num_embeddings, 10).tolist()
    model = CodeHiFiGAN(SMALL, max_frames=8)
    params = model.init(
        jax.random.PRNGKey(2), jnp.asarray([units], jnp.int32),
        jnp.asarray([len(units)], jnp.int32),
    )
    exact = np.asarray(model.apply(
        params, jnp.asarray([units], jnp.int32),
        jnp.asarray([len(units)], jnp.int32),
        method=CodeHiFiGAN.unit_durations,
    ))[0]
    buf = np.zeros((1, 32), np.int32)
    buf[0, : len(units)] = units
    padded = np.asarray(model.apply(
        params, jnp.asarray(buf), jnp.asarray([len(units)], np.int32),
        method=CodeHiFiGAN.unit_durations,
    ))[0]
    np.testing.assert_array_equal(padded[: len(units)], exact)
    assert (padded[len(units):] == 0).all()
