"""Pallas attention kernel vs XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_s2ut.ops.attention import flash_attention, reference_attention

NEG_INF = -1e9


@pytest.mark.parametrize("tq,s", [(128, 128), (64, 96), (120, 40)])
def test_flash_matches_reference(tq, s):
    rng = jax.random.PRNGKey(0)
    B, H, D = 2, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(1), (B, tq, H, D))
    k = jax.random.normal(jax.random.PRNGKey(2), (B, s, H, D))
    v = jax.random.normal(jax.random.PRNGKey(3), (B, s, H, D))
    mask = jnp.zeros((B, s), bool).at[1, s // 2 :].set(True)
    got = np.asarray(
        flash_attention(q, k, v, key_padding_mask=mask, interpret=True, block_q=32)
    )
    bias = jnp.where(mask, NEG_INF, 0.0)[:, None, None, :]
    want = np.asarray(reference_attention(q * D**-0.5, k, v, bias))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_no_mask():
    B, T, H, D = 1, 64, 4, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    want = np.asarray(reference_attention(q * D**-0.5, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_grad_matches_reference():
    """jax.grad through the Pallas forward (custom_vjp recompute) equals
    the grad of the pure-XLA reference — the kernel is trainable."""
    B, T, S, H, D = 2, 32, 48, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    mask = jnp.zeros((B, S), bool).at[1, S // 2 :].set(True)
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, D))

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, key_padding_mask=mask, interpret=True, block_q=16
        )
        return (out * g).sum()

    bias = jnp.where(mask, NEG_INF, 0.0)[:, None, None, :]

    def loss_ref(q, k, v):
        return (reference_attention(q * D**-0.5, k, v, bias) * g).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_encoder_flash_flag_matches_reference():
    """use_flash plumbs through the encoder without changing the math
    (CPU dispatch falls back to the XLA reference path)."""
    from mm_s2ut.models.s2t_encoder import SpeechTransformerEncoder

    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 80))
    lengths = jnp.array([37, 21])
    enc_a = SpeechTransformerEncoder(
        embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2,
        conv_channels=16, use_flash=False,
    )
    enc_b = SpeechTransformerEncoder(
        embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2,
        conv_channels=16, use_flash=True,
    )
    params = enc_a.init(jax.random.PRNGKey(1), feats, lengths)
    out_a = enc_a.apply(params, feats, lengths)
    out_b = enc_b.apply(params, feats, lengths)
    np.testing.assert_allclose(
        np.asarray(out_a["encoder_out"]), np.asarray(out_b["encoder_out"]),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("window", [0, 5])
def test_flash_causal_matches_reference(window):
    """In-kernel causal/window iota mask == reference masking."""
    B, T, H, D = 2, 48, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, D))
    mask = jnp.zeros((B, T), bool).at[1, T - 9 :].set(True)
    got = np.asarray(flash_attention(
        q, k, v, key_padding_mask=mask, interpret=True, block_q=16,
        causal=True, window=window,
    ))
    bias = jnp.where(mask, NEG_INF, 0.0)[:, None, None, :]
    want = np.asarray(reference_attention(
        q * D**-0.5, k, v, bias, causal=True, window=window
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_causal_grad_matches_reference():
    B, T, H, D = 1, 32, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(4), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(5), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(6), (B, T, H, D))

    def f_flash(q, k, v):
        return flash_attention(
            q, k, v, interpret=True, block_q=16, causal=True, window=4
        ).sum()

    def f_ref(q, k, v):
        return reference_attention(
            q * D**-0.5, k, v, None, causal=True, window=4
        ).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_causal_encoder_flash_flag_matches_folded_bias():
    """use_flash=True (kernel/dispatch causal plumbing) == use_flash=False
    (dense folded-bias path) for a causal encoder, incl. a left window."""
    from mm_s2ut.models.s2t_encoder import SpeechTransformerEncoder

    B, T = 2, 57
    feats = jnp.asarray(
        np.random.RandomState(0).randn(B, T, 80).astype(np.float32)
    )
    lengths = jnp.asarray([T, T - 17], jnp.int32)
    for window in (0, 6):
        kw = dict(
            embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2,
            conv_channels=16, causal_attention=True, attention_window=window,
        )
        enc_a = SpeechTransformerEncoder(use_flash=False, **kw)
        enc_b = SpeechTransformerEncoder(use_flash=True, **kw)
        params = enc_a.init(jax.random.PRNGKey(0), feats, lengths)
        out_a = enc_a.apply(params, feats, lengths)
        out_b = enc_b.apply(params, feats, lengths)
        np.testing.assert_allclose(
            np.asarray(out_a["encoder_out"]), np.asarray(out_b["encoder_out"]),
            atol=1e-5, rtol=1e-5,
        )


def test_flash_dropout_matches_reference_mask():
    """In-kernel hash dropout == reference-path hash dropout: both build
    the keep-mask from (bh, qpos, kpos, seed) via dropout_keep, so the
    Pallas tiles and the dense XLA recompute agree elementwise."""
    B, T, S, H, D = 2, 64, 64, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    mask = jnp.zeros((B, S), bool).at[1, S // 2 :].set(True)
    seed = jnp.asarray(12345, jnp.uint32)
    got = np.asarray(flash_attention(
        q, k, v, key_padding_mask=mask, interpret=True, block_q=16,
        dropout_rate=0.3, dropout_seed=seed,
    ))
    bias = jnp.where(mask, NEG_INF, 0.0)[:, None, None, :]
    want = np.asarray(reference_attention(
        q * D**-0.5, k, v, bias, dropout_rate=0.3, dropout_seed=seed,
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    # And it actually drops: deterministic run differs.
    base = np.asarray(flash_attention(
        q, k, v, key_padding_mask=mask, interpret=True, block_q=16,
    ))
    assert np.abs(got - base).max() > 1e-3


def test_flash_dropout_keep_fraction_and_seed_variation():
    from mm_s2ut.ops.attention import dropout_keep

    bh = jnp.arange(4, dtype=jnp.uint32)[:, None, None]
    qpos = jnp.arange(128, dtype=jnp.uint32)[None, :, None]
    kpos = jnp.arange(128, dtype=jnp.uint32)[None, None, :]
    keep1 = np.asarray(dropout_keep(bh, qpos, kpos, jnp.uint32(7), 0.25))
    keep2 = np.asarray(dropout_keep(bh, qpos, kpos, jnp.uint32(8), 0.25))
    assert abs(keep1.mean() - 0.75) < 0.01
    assert abs(keep2.mean() - 0.75) < 0.01
    # Different seeds give decorrelated masks.
    agree = (keep1 == keep2).mean()
    assert 0.5 < agree < 0.75  # ~= 0.75^2 + 0.25^2 = 0.625
    # Mask varies across heads/rows (not a broadcast accident).
    assert keep1.std(axis=0).max() > 0
    assert keep1[0].std(axis=0).max() > 0


def test_flash_dropout_grad_uses_same_mask():
    """Backward recompute under dropout regenerates the identical mask:
    grads of the flash path equal grads of the hash-dropout reference."""
    B, T, S, H, D = 2, 32, 32, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, D))
    seed = jnp.asarray(99, jnp.uint32)

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, interpret=True, block_q=16,
            dropout_rate=0.2, dropout_seed=seed,
        )
        return (out * g).sum()

    def loss_ref(q, k, v):
        out = reference_attention(
            q * D**-0.5, k, v, None, dropout_rate=0.2, dropout_seed=seed
        )
        return (out * g).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("window", [0, 24])
@pytest.mark.parametrize("tq", [64, 40])
def test_causal_skip_kernel_matches_reference(window, tq):
    """The k-block-skipping causal kernel (skips strictly-above-diagonal
    key blocks) equals the reference for full-causal and windowed masks,
    including a ragged final q-block."""
    from mm_s2ut.ops.attention import _flash_call

    B, H, D, S = 2, 2, 16, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, tq, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    mask = jnp.zeros((B, S), bool).at[1, S - 9 :].set(True)
    bias = jnp.where(mask, NEG_INF, 0.0)[:, None, None, :]
    seed = jnp.asarray(0, jnp.uint32)
    got = _flash_call(
        q, k, v, bias, seed, D**-0.5, 16, True, causal=True,
        window=window, block_k=16,
    )
    want = reference_attention(
        q * D**-0.5, k, v, bias, causal=True, window=window
    )[:, :tq]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_causal_skip_kernel_dropout_mask_parity():
    """Dropout inside the skip kernel regenerates the same hash mask as
    the reference (the backward recompute's contract)."""
    from mm_s2ut.ops.attention import _flash_call

    B, T, H, D = 2, 32, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    bias = jnp.zeros((B, 1, 1, T))
    seed = jnp.asarray(7, jnp.uint32)
    got = _flash_call(
        q, k, v, bias, seed, D**-0.5, 16, True, causal=True,
        dropout_rate=0.2, block_k=16,
    )
    want = reference_attention(
        q * D**-0.5, k, v, bias, causal=True,
        dropout_rate=0.2, dropout_seed=seed,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_flash_bwd_xla_path_dropout_parity():
    """The default production backward (_flash_bwd_xla: dense recompute +
    VJP with the hash-dropout seed) regenerates the forward kernel's
    dropout mask — asserted DIRECTLY against the Pallas backward kernel
    with the same seed, not just transitively via forward-mask tests."""
    from mm_s2ut.ops.attention import _flash_bwd_call, _flash_bwd_xla

    B, T, S, H, D = 2, 32, 32, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, D))
    bias = jnp.zeros((B, 1, 1, S))
    seed = jnp.asarray(123, jnp.uint32)
    scale = D**-0.5

    want = _flash_bwd_call(
        q, k, v, bias, seed, g, scale, 16, True, False, 0, 0.2
    )
    got = _flash_bwd_xla(q, k, v, bias, seed, g, scale, False, 0, 0.2)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_flash_bwd_ragged_qlen_rows_masked():
    """Tq not a block multiple: the bwd kernel's padded q-rows must not
    leak garbage into the accumulated dK/dV (row-validity mask)."""
    B, T, S, H, D = 2, 40, 48, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    mask = jnp.zeros((B, S), bool).at[1, S // 2 :].set(True)
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, D))
    bias = jnp.where(mask, NEG_INF, 0.0)[:, None, None, :]

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, key_padding_mask=mask, interpret=True, block_q=16
        )
        return (out * g).sum()

    def loss_ref(q, k, v):
        return (reference_attention(q * D**-0.5, k, v, bias) * g).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
