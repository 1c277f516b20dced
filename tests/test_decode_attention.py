"""Ancestry-indexed decode-attention kernel vs its XLA reference, and vs a
brute-force gather formulation (the semantics the physical reorder had).
Cache layout: (B, L, H, T·K, 2·Dh), K‖V interleaved on the last axis."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_s2ut.ops import decode_attention as da


def _make(B=2, H=4, K=3, T=16, L=2, Dh=8, step=9, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, K, Dh), dtype) * 0.3
    k_new = jnp.asarray(rng.randn(B, H, K, Dh), dtype) * 0.3
    v_new = jnp.asarray(rng.randn(B, H, K, Dh), dtype) * 0.3
    kv = jnp.asarray(rng.randn(B, L, H, T * K, 2 * Dh), dtype) * 0.3
    ancestry = jnp.asarray(rng.randint(0, K, (B, K, T)), jnp.int32)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    flat_idx = jnp.where(t_idx < step, t_idx * K + ancestry, -1)
    flat_rep = jnp.repeat(flat_idx, K, axis=2)  # (B, K, T·K)
    return q, k_new, v_new, kv, ancestry, flat_rep, step


def _brute_force(q, k_new, v_new, kv, ancestry, step, layer):
    """Gather each beam's true prefix rows, then ordinary attention."""
    B, H, K, Dh = q.shape
    T = ancestry.shape[2]
    out = np.zeros((B, H, K, Dh), np.float32)
    q, k_new, v_new = map(lambda x: np.asarray(x, np.float64), (q, k_new, v_new))
    kv = np.asarray(kv, np.float64)
    for b in range(B):
        for h in range(H):
            for k in range(K):
                keys = [kv[b, layer, h, t * K + int(ancestry[b, k, t]), :Dh]
                        for t in range(step)]
                vals = [kv[b, layer, h, t * K + int(ancestry[b, k, t]), Dh:]
                        for t in range(step)]
                keys.append(k_new[b, h, k])
                vals.append(v_new[b, h, k])
                keys, vals = np.stack(keys), np.stack(vals)
                logits = keys @ q[b, h, k]
                w = np.exp(logits - logits.max())
                w /= w.sum()
                out[b, h, k] = (w[:, None] * vals).sum(0)
    return out


def test_reference_matches_brute_force():
    q, k_new, v_new, kv, ancestry, flat_rep, step = _make()
    for layer in range(2):
        got = np.asarray(da.reference(q, k_new, v_new, kv, flat_rep, layer))
        want = _brute_force(q, k_new, v_new, kv, ancestry, step, layer)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_kernel_interpret_matches_reference():
    q, k_new, v_new, kv, ancestry, flat_rep, step = _make(
        B=2, H=2, K=5, T=24, Dh=16, step=17, seed=1
    )
    for layer in range(2):
        ref = np.asarray(da.reference(q, k_new, v_new, kv, flat_rep, layer))
        got = np.asarray(
            da.ancestry_decode_attention(
                q, k_new, v_new, kv, flat_rep, layer, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_step_zero_attends_only_self():
    q, k_new, v_new, kv, ancestry, flat_rep, _ = _make(step=0, seed=2)
    got = np.asarray(da.reference(q, k_new, v_new, kv, flat_rep, 0))
    np.testing.assert_allclose(got, np.asarray(v_new, np.float32), atol=1e-5)


def _quantize(kv):
    """Per-column symmetric int8 of an interleaved K‖V cache (the
    UnitDecoder._step_core write-path convention)."""
    Dh = kv.shape[-1] // 2
    k_half = np.asarray(kv[..., :Dh], np.float32)
    v_half = np.asarray(kv[..., Dh:], np.float32)
    sk = np.maximum(np.abs(k_half).max(-1), 1e-8) / 127.0
    sv = np.maximum(np.abs(v_half).max(-1), 1e-8) / 127.0
    k_q = np.clip(np.round(k_half / sk[..., None]), -127, 127)
    v_q = np.clip(np.round(v_half / sv[..., None]), -127, 127)
    kv_q = np.concatenate([k_q, v_q], -1).astype(np.int8)
    return jnp.asarray(kv_q), jnp.asarray(sk), jnp.asarray(sv)


def test_reference_i8_close_to_fp():
    q, k_new, v_new, kv, ancestry, flat_rep, step = _make(seed=3)
    kv_q, sk, sv = _quantize(kv)
    for layer in range(2):
        want = np.asarray(da.reference(q, k_new, v_new, kv, flat_rep, layer))
        got = np.asarray(
            da.reference_i8(q, k_new, v_new, kv_q, sk, sv, flat_rep, layer)
        )
        # int8 per-column quantization: outputs agree to ~1%.
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=5e-2)


def test_kernel_i8_interpret_matches_reference_i8():
    q, k_new, v_new, kv, ancestry, flat_rep, step = _make(
        B=2, H=2, K=5, T=24, Dh=16, step=17, seed=4
    )
    kv_q, sk, sv = _quantize(kv)
    for layer in range(2):
        ref = np.asarray(
            da.reference_i8(q, k_new, v_new, kv_q, sk, sv, flat_rep, layer)
        )
        got = np.asarray(
            da.ancestry_decode_attention_i8(
                q, k_new, v_new, kv_q, sk, sv, flat_rep, layer, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_cross_kernel_interpret_matches_reference():
    rng = np.random.RandomState(5)
    B, H, K, S, Dh = 2, 2, 5, 24, 16
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32) * 0.3
    kv = jnp.asarray(rng.randn(B, H, S, 2 * Dh), jnp.float32) * 0.3
    mask = rng.rand(B, S) < 0.2
    bias = jnp.where(jnp.asarray(mask), -1e9, 0.0).astype(jnp.float32)
    ref = np.asarray(da.cross_reference(q, kv, bias))
    got = np.asarray(da.cross_decode_attention(q, kv, bias, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_cross_reference_matches_plain_attention():
    """The packed-layout contraction equals ordinary softmax attention."""
    rng = np.random.RandomState(6)
    B, H, K, S, Dh = 2, 3, 4, 10, 8
    q = rng.randn(B, H, K, Dh).astype(np.float32)
    k = rng.randn(B, H, S, Dh).astype(np.float32)
    v = rng.randn(B, H, S, Dh).astype(np.float32)
    kv = jnp.asarray(np.concatenate([k, v], -1))
    bias = jnp.zeros((B, S), jnp.float32)
    got = np.asarray(da.cross_reference(jnp.asarray(q), kv, bias))
    scores = np.einsum("bhkd,bhsd->bhks", q, k)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    want = np.einsum("bhks,bhsd->bhkd", w, v)
    np.testing.assert_allclose(got, want, atol=1e-5)

def test_cross_reference_i8_close_to_fp():
    rng = np.random.RandomState(7)
    B, H, K, S, Dh = 2, 2, 5, 24, 16
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32) * 0.3
    kv = jnp.asarray(rng.randn(B, H, S, 2 * Dh), jnp.float32) * 0.3
    mask = rng.rand(B, S) < 0.2
    bias = jnp.where(jnp.asarray(mask), -1e9, 0.0).astype(jnp.float32)
    kv_q, sk, sv = _quantize(kv)
    want = np.asarray(da.cross_reference(q, kv, bias))
    got = np.asarray(da.cross_reference_i8(q, kv_q, sk, sv, bias))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=5e-2)


def test_cross_kernel_i8_interpret_matches_reference_i8():
    rng = np.random.RandomState(8)
    B, H, K, S, Dh = 2, 2, 5, 24, 16
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32) * 0.3
    kv = jnp.asarray(rng.randn(B, H, S, 2 * Dh), jnp.float32) * 0.3
    mask = rng.rand(B, S) < 0.2
    bias = jnp.where(jnp.asarray(mask), -1e9, 0.0).astype(jnp.float32)
    kv_q, sk, sv = _quantize(kv)
    ref = np.asarray(da.cross_reference_i8(q, kv_q, sk, sv, bias))
    got = np.asarray(
        da.cross_decode_attention_i8(q, kv_q, sk, sv, bias, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_cross_block_rows_chooser():
    # Bench shape (B=128, S=250, K=10 beams, int8): per-program overhead
    # dominates → largest block whose scoped-VMEM footprint (slab +
    # in-kernel dequant copies + score intermediates) fits; nb=16's
    # footprint was rejected by the real compiler (18.8 MB > 16 MB).
    assert da._cross_block_rows(128, 8, 250, 64, 10, 1, i8=True) == 8
    # Long sources blow the VMEM budget → smaller blocks, eventually 1.
    assert da._cross_block_rows(128, 8, 4000, 64, 10, 2, i8=False) == 1
    # nb must divide B.
    assert da._cross_block_rows(12, 8, 250, 64, 10, 1, i8=True) == 4
    assert da._cross_block_rows(1, 8, 250, 64, 10, 1, i8=True) == 1


def test_cross_kernel_blocked_grid_matches_reference():
    """B=16 picks an NB>2 block; the blocked grid must tile batch rows
    without mixing them."""
    rng = np.random.RandomState(9)
    B, H, K, S, Dh = 16, 2, 5, 24, 16
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.float32) * 0.3
    kv = jnp.asarray(rng.randn(B, H, S, 2 * Dh), jnp.float32) * 0.3
    mask = rng.rand(B, S) < 0.2
    bias = jnp.where(jnp.asarray(mask), -1e9, 0.0).astype(jnp.float32)
    assert da._cross_block_rows(B, H, S, Dh, K, 4, i8=False) > 2
    ref = np.asarray(da.cross_reference(q, kv, bias))
    got = np.asarray(da.cross_decode_attention(q, kv, bias, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    kv_q, sk, sv = _quantize(kv)
    ref8 = np.asarray(da.cross_reference_i8(q, kv_q, sk, sv, bias))
    got8 = np.asarray(
        da.cross_decode_attention_i8(q, kv_q, sk, sv, bias, interpret=True)
    )
    np.testing.assert_allclose(got8, ref8, atol=1e-5)


def test_precompute_kv_int8_dequantizes_close():
    """MultiHeadAttention.precompute_kv(kv_dtype='int8') stores a slab
    whose dequantized columns match the fp slab to int8 precision."""
    from mm_s2ut.models.layers import MultiHeadAttention

    rng = np.random.RandomState(9)
    B, S, D, H = 2, 12, 32, 4
    attn = MultiHeadAttention(embed_dim=D, num_heads=H, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, x, x)
    fp = attn.apply(params, x, method=MultiHeadAttention.precompute_kv)
    q8 = attn.apply(
        params, x, method=MultiHeadAttention.precompute_kv, kv_dtype="int8"
    )
    assert q8["kv"].dtype == jnp.int8
    Dh = D // H
    k_deq = np.asarray(q8["kv"][..., :Dh], np.float32) * np.asarray(q8["sk"])[..., None]
    v_deq = np.asarray(q8["kv"][..., Dh:], np.float32) * np.asarray(q8["sv"])[..., None]
    np.testing.assert_allclose(k_deq, np.asarray(fp["kv"][..., :Dh]), atol=2e-2)
    np.testing.assert_allclose(v_deq, np.asarray(fp["kv"][..., Dh:]), atol=2e-2)


# -- int4 (half-split nibble packing) ----------------------------------------


def _quantize_i4(kv):
    """Per-column symmetric int4 of an interleaved K‖V cache (the
    UnitDecoder._step_core int4 write-path convention): values in
    [-7, 7], scale = amax/7."""
    Dh = kv.shape[-1] // 2
    k_half = np.asarray(kv[..., :Dh], np.float32)
    v_half = np.asarray(kv[..., Dh:], np.float32)
    sk = np.maximum(np.abs(k_half).max(-1), 1e-8) / 7.0
    sv = np.maximum(np.abs(v_half).max(-1), 1e-8) / 7.0
    k_q = np.clip(np.round(k_half / sk[..., None]), -7, 7)
    v_q = np.clip(np.round(v_half / sv[..., None]), -7, 7)
    cols = jnp.asarray(np.concatenate([k_q, v_q], -1).astype(np.int8))
    return cols, jnp.asarray(sk), jnp.asarray(sv)


def test_i4_pack_unpack_roundtrip():
    rng = np.random.RandomState(10)
    cols = jnp.asarray(rng.randint(-8, 8, (3, 12, 16)), jnp.int8)
    packed = da.i4_pack(cols, 6)
    assert packed.shape == (3, 6, 16) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(da.i4_unpack(packed)), np.asarray(cols))
    # Short column count pads with zeros.
    packed = da.i4_pack(cols[:, :9], 6)
    out = np.asarray(da.i4_unpack(packed))
    np.testing.assert_array_equal(out[:, :9], np.asarray(cols[:, :9]))
    assert (out[:, 9:] == 0).all()


@pytest.mark.parametrize("P_old,P_new", [(6, 12), (8, 11)])
def test_i4_regrow_preserves_columns(P_old, P_new):
    """Growth re-pairs every stored column for the new half boundary —
    both the doubling case and the final partial growth (P_new < 2·P_old,
    where old high-half columns land in new high nibbles)."""
    rng = np.random.RandomState(11)
    cols = jnp.asarray(rng.randint(-8, 8, (2, 2 * P_old, 16)), jnp.int8)
    packed = da.i4_pack(cols, P_old)
    grown = da.i4_regrow(packed, P_new)
    assert grown.shape == (2, P_new, 16)
    out = np.asarray(da.i4_unpack(grown))
    np.testing.assert_array_equal(out[:, : 2 * P_old], np.asarray(cols))
    assert (out[:, 2 * P_old:] == 0).all()


def test_reference_i4_close_to_fp():
    q, k_new, v_new, kv, ancestry, flat_rep, step = _make(seed=12)
    cols, sk, sv = _quantize_i4(kv)
    packed = da.i4_pack(cols, cols.shape[-2] // 2)
    for layer in range(2):
        want = np.asarray(da.reference(q, k_new, v_new, kv, flat_rep, layer))
        got = np.asarray(
            da.reference_i4(q, k_new, v_new, packed, sk, sv, flat_rep, layer)
        )
        # int4 per-column quantization: ~7% relative error on K/V.
        np.testing.assert_allclose(got, want, atol=1e-1, rtol=2e-1)


def test_kernel_i4_interpret_matches_reference_i4():
    q, k_new, v_new, kv, ancestry, flat_rep, step = _make(
        B=2, H=2, K=5, T=24, Dh=16, step=17, seed=13
    )
    cols, sk, sv = _quantize_i4(kv)
    packed = da.i4_pack(cols, cols.shape[-2] // 2)
    for layer in range(2):
        ref = np.asarray(
            da.reference_i4(q, k_new, v_new, packed, sk, sv, flat_rep, layer)
        )
        got = np.asarray(
            da.ancestry_decode_attention_i4(
                q, k_new, v_new, packed, sk, sv, flat_rep, layer, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)
