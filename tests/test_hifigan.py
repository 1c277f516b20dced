"""HiFi-GAN vocoder tests: length regulation, output shapes, and numerical
parity of the fairseq-checkpoint converter against a torch reimplementation
of the standard HiFiGAN generator graph."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_s2ut.models.hifigan import (
    CodeHiFiGAN,
    HiFiGANConfig,
    HiFiGANGenerator,
    length_regulate,
    load_fairseq_checkpoint,
)

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


def test_length_regulate_matches_numpy_repeat():
    rng = np.random.RandomState(0)
    emb = rng.randn(2, 4, 3).astype(np.float32)
    dur = np.array([[2, 1, 3, 0], [1, 1, 1, 1]])
    frames, total = length_regulate(jnp.asarray(emb), jnp.asarray(dur), 8)
    assert list(np.asarray(total)) == [6, 4]
    want0 = np.repeat(emb[0], dur[0], axis=0)
    np.testing.assert_allclose(np.asarray(frames)[0, :6], want0, rtol=1e-6)
    assert np.all(np.asarray(frames)[0, 6:] == 0)


@pytest.mark.slow
def test_generator_output_length():
    gen = HiFiGANGenerator(SMALL)
    x = jnp.ones((2, 10, SMALL.model_in_dim))
    params = gen.init(jax.random.PRNGKey(0), x)
    y = gen.apply(params, x)
    assert y.shape == (2, 10 * SMALL.hop_length)  # hop = 4*2 = 8
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_code_hifigan_end_to_end():
    model = CodeHiFiGAN(SMALL, max_frames=64)
    units = jnp.asarray([[1, 5, 7, 2, 0, 0], [3, 3, 9, 9, 9, 1]])
    lengths = jnp.asarray([4, 6])
    params = model.init(jax.random.PRNGKey(0), units, lengths)
    wav, n_samples = model.apply(params, units, lengths)
    assert wav.shape == (2, 64 * SMALL.hop_length)
    n = np.asarray(n_samples)
    assert (n > 0).all() and (n <= 64 * SMALL.hop_length).all()
    # Without dur prediction: one frame per unit.
    wav2, n2 = model.apply(params, units, lengths, dur_prediction=False)
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(lengths) * SMALL.hop_length)


def _torch_generator(cfg):
    """Standard HiFiGAN generator graph with fairseq state-dict naming."""
    import torch
    from torch import nn as tnn

    class TResBlock(tnn.Module):
        def __init__(self, ch, k, dils):
            super().__init__()
            self.convs1 = tnn.ModuleList(
                [tnn.Conv1d(ch, ch, k, dilation=d, padding=(k - 1) * d // 2) for d in dils]
            )
            self.convs2 = tnn.ModuleList(
                [tnn.Conv1d(ch, ch, k, padding=(k - 1) // 2) for _ in dils]
            )

        def forward(self, x):
            import torch.nn.functional as F

            for c1, c2 in zip(self.convs1, self.convs2):
                h = c2(F.leaky_relu(c1(F.leaky_relu(x, 0.1)), 0.1))
                x = x + h
            return x

    class TGen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = tnn.Conv1d(cfg.model_in_dim, cfg.upsample_initial_channel, 7, padding=3)
            self.ups = tnn.ModuleList()
            self.resblocks = tnn.ModuleList()
            for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
                ch_in = cfg.upsample_initial_channel // (2**i)
                ch = cfg.upsample_initial_channel // (2 ** (i + 1))
                self.ups.append(tnn.ConvTranspose1d(ch_in, ch, k, r, padding=(k - r) // 2))
                for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                    self.resblocks.append(TResBlock(ch, rk, rd))
            self.conv_post = tnn.Conv1d(ch, 1, 7, padding=3)

        def forward(self, x):
            import torch
            import torch.nn.functional as F

            n = len(cfg.resblock_kernel_sizes)
            x = self.conv_pre(x)
            for i, up in enumerate(self.ups):
                x = up(F.leaky_relu(x, 0.1))
                xs = None
                for j in range(n):
                    h = self.resblocks[i * n + j](x)
                    xs = h if xs is None else xs + h
                x = xs / n
            return torch.tanh(self.conv_post(F.leaky_relu(x, 0.1)))

    return TGen()


def test_fairseq_converter_parity(tmp_path):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    tgen = _torch_generator(SMALL)
    sd = {f"{k}": v for k, v in tgen.state_dict().items()}
    # Add dict embedding (converter requires it).
    sd["dict.weight"] = torch.randn(SMALL.num_embeddings, SMALL.embedding_dim)
    ckpt = tmp_path / "vocoder.pt"
    torch.save(sd, ckpt)

    cfg = HiFiGANConfig(**{**SMALL.__dict__, "dur_prediction": False})
    variables = load_fairseq_checkpoint(ckpt, cfg)

    x = np.random.RandomState(1).randn(2, 12, SMALL.model_in_dim).astype(np.float32)
    with torch.no_grad():
        want = tgen(torch.tensor(x).transpose(1, 2)).squeeze(1).numpy()
    gen = HiFiGANGenerator(cfg)
    got = np.asarray(gen.apply({"params": variables["params"]["generator"]}, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_grouped_mrf_matches_ungrouped():
    """Packed grouped-conv MRF == per-block MRF (zero taps contribute 0)."""
    gen_a = HiFiGANGenerator(SMALL, grouped_mrf=False)
    gen_b = HiFiGANGenerator(SMALL, grouped_mrf=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, SMALL.model_in_dim)
                    .astype(np.float32))
    params = gen_a.init(jax.random.PRNGKey(0), x)
    ya = np.asarray(gen_a.apply(params, x))
    yb = np.asarray(gen_b.apply(params, x))
    np.testing.assert_allclose(ya, yb, atol=2e-5, rtol=1e-4)


def test_folded_mrf_matches_per_block():
    """Time-folded MRF (dense (K', f·C, f·C) kernels over the reshaped
    (T/f, f·C) signal) == per-block MRF, bit-exact in fp32."""
    gen_a = HiFiGANGenerator(SMALL, folded_mrf=False)
    gen_b = HiFiGANGenerator(SMALL, folded_mrf=True)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 16, SMALL.model_in_dim), jnp.float32
    )
    p = gen_a.init(jax.random.PRNGKey(0), x)
    ya = gen_a.apply(p, x)
    yb = gen_b.apply(p, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-5, rtol=1e-4)


def test_fold_matrix_structure():
    from mm_s2ut.models.hifigan import _fold_matrix

    for k, d, f in [(3, 1, 8), (11, 5, 8), (7, 3, 4), (11, 1, 2)]:
        M, pl_, pr = _fold_matrix(k, d, f)
        assert M.shape[0] == k and M.shape[2] == M.shape[3] == f
        # every (tap, out-phase) lands in exactly one (block, in-phase)
        assert M.sum() == k * f
        assert (M.sum(axis=(1, 2)) == 1).all()
        assert pl_ >= 0 and pr >= 0 and M.shape[1] == pl_ + pr + 1


def test_vocode_bucketed_matches_direct():
    """Bucketed vocoding == the direct call at a covering budget, and the
    branch selection tracks the batch's actual frame need."""
    from mm_s2ut.models.hifigan import vocode_bucketed

    model = CodeHiFiGAN(SMALL, max_frames=32)
    units = jnp.asarray([[1, 5, 7, 2, 0, 0], [3, 3, 9, 9, 9, 1]])
    lengths = jnp.asarray([4, 6])
    params = model.init(jax.random.PRNGKey(0), units, lengths)
    want_wav, want_n = model.apply(params, units, lengths)
    got_wav, got_n = vocode_bucketed(
        SMALL, params, units, lengths, buckets=(8, 16, 32),
    )
    np.testing.assert_array_equal(np.asarray(want_n), np.asarray(got_n))
    hop = SMALL.hop_length
    for i in range(2):
        n = int(want_n[i])
        np.testing.assert_allclose(
            np.asarray(got_wav)[i, :n], np.asarray(want_wav)[i, :n],
            atol=1e-5, rtol=1e-4,
        )
    # Output is padded to the largest bucket.
    assert got_wav.shape[1] == 32 * hop
    # Under jit too (lax.switch with traced index).
    j_wav, j_n = jax.jit(
        lambda p, u, l: vocode_bucketed(SMALL, p, u, l, buckets=(8, 16, 32))
    )(params, units, lengths)
    np.testing.assert_allclose(
        np.asarray(j_wav), np.asarray(got_wav), atol=1e-5, rtol=1e-4
    )
