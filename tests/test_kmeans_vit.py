"""k-means quantizer and ViT encoder tests (incl. torch parity of the
timm-format checkpoint converter)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mm_s2ut.ops.kmeans import (
    KMeansQuantizer,
    dedup_units,
    kmeans_assign,
    kmeans_fit,
    kmeans_plusplus_init,
    squared_distances,
)
from mm_s2ut.models.vit import (
    ViTConfig,
    VisionTransformer,
    attention_rollout,
    convert_timm_state_dict,
    preprocess_images,
)


def test_distances_match_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(17, 5).astype(np.float32)
    c = rng.randn(4, 5).astype(np.float32)
    got = np.asarray(squared_distances(jnp.asarray(x), jnp.asarray(c)))
    want = ((x[:, None, :] - c[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(kmeans_assign(jnp.asarray(x), jnp.asarray(c))), want.argmin(-1)
    )


def test_kmeans_fit_recovers_clusters():
    rng = np.random.RandomState(0)
    centers = np.array([[0, 0], [5, 5], [-5, 5]], np.float32)
    x = np.concatenate([c + 0.2 * rng.randn(100, 2) for c in centers]).astype(np.float32)
    key = jax.random.PRNGKey(0)
    init = kmeans_plusplus_init(key, jnp.asarray(x), 3)
    cents, inertia = kmeans_fit(key, jnp.asarray(x), init, n_steps=10)
    # Each true center has a learned centroid within 0.2.
    d = np.sqrt(((np.asarray(cents)[:, None] - centers[None]) ** 2).sum(-1))
    assert (d.min(axis=0) < 0.2).all()
    assert float(inertia[-1]) <= float(inertia[0])


def test_kmeans_init_spreads_on_centered_data():
    """Regression: zero-filled placeholder rows acted as phantom ORIGIN
    centroids inside the greedy far-point pick, so on mean-centered data
    the init degenerated to farthest-from-origin sampling — a cluster at
    the origin could never receive a centroid."""
    rng = np.random.RandomState(0)
    # Three clusters, one AT the origin (mean-centered layout).
    centers = np.array([[0, 0], [8, 0], [-8, 0]], np.float32)
    x = np.concatenate(
        [c + 0.1 * rng.randn(80, 2) for c in centers]
    ).astype(np.float32)
    init = np.asarray(kmeans_plusplus_init(jax.random.PRNGKey(1), jnp.asarray(x), 3))
    d = np.sqrt(((init[:, None] - centers[None]) ** 2).sum(-1))
    # Every true cluster (including the origin one) gets an init centroid.
    assert (d.min(axis=0) < 1.0).all(), d


def test_quantizer_decode_and_sklearn_compat(tmp_path):
    sklearn = pytest.importorskip("sklearn")
    import joblib
    from sklearn.cluster import MiniBatchKMeans

    rng = np.random.RandomState(0)
    x = rng.randn(200, 8).astype(np.float32)
    km = MiniBatchKMeans(n_clusters=10, n_init=3, random_state=0).fit(x)
    joblib.dump(km, tmp_path / "km.bin")
    q = KMeansQuantizer.load(str(tmp_path / "km.bin"))
    np.testing.assert_array_equal(q(x[:50]), km.predict(x[:50]))

    out = q.decode(x[:12], beamsearch=True, top_k=3, beamsize=8)
    assert len(out["code"]) == 12
    assert out["merged_code"] == dedup_units(out["code"])
    # center_diff (reference mhubert.py:62-67): residual to the assigned
    # centroid, per frame.
    np.testing.assert_allclose(
        out["center_diff"],
        x[:12] - km.cluster_centers_[out["code"]],
        atol=1e-5,
    )
    assert len(out["beam_code"]) == 12
    # Beam result stays within per-frame top-k candidates.
    order = np.argsort(out["distance"], axis=1)[:, :3]
    for t, u in enumerate(out["beam_code"]):
        assert u in order[t]


def test_dedup():
    assert dedup_units([1, 1, 2, 2, 2, 1, 3, 3]) == [1, 2, 1, 3]


TINY = ViTConfig(image_size=32, patch_size=16, embed_dim=24, depth=2, num_heads=2)


@pytest.mark.slow
def test_vit_shapes_and_rollout():
    model = VisionTransformer(TINY)
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats, attns = model.apply(params, x, return_attn=True)
    assert feats.shape == (2, 5, 24)  # 4 patches + cls
    assert len(attns) == 2 and attns[0].shape == (2, 2, 5, 5)
    mask = attention_rollout([np.asarray(a) for a in attns], discard_ratio=0.5)
    assert mask.shape == (2, 4)
    assert np.isfinite(mask).all() and mask.max() <= 1.0 + 1e-6


def test_timm_converter_parity():
    torch = pytest.importorskip("torch")
    from torch import nn as tnn
    import torch.nn.functional as F

    torch.manual_seed(0)
    c = TINY

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(c.embed_dim, eps=c.layernorm_eps)
            self.attn = tnn.Module()
            self.attn.qkv = tnn.Linear(c.embed_dim, 3 * c.embed_dim)
            self.attn.proj = tnn.Linear(c.embed_dim, c.embed_dim)
            self.norm2 = tnn.LayerNorm(c.embed_dim, eps=c.layernorm_eps)
            self.mlp = tnn.Module()
            self.mlp.fc1 = tnn.Linear(c.embed_dim, int(c.embed_dim * c.mlp_ratio))
            self.mlp.fc2 = tnn.Linear(int(c.embed_dim * c.mlp_ratio), c.embed_dim)

        def forward(self, x):
            B, T, D = x.shape
            h = self.norm1(x)
            qkv = self.attn.qkv(h).reshape(B, T, 3, c.num_heads, D // c.num_heads)
            q, k, v = qkv.unbind(2)
            attn = (q.transpose(1, 2) @ k.transpose(1, 2).transpose(-2, -1)) * (
                (D // c.num_heads) ** -0.5
            )
            attn = attn.softmax(-1)
            out = (attn @ v.transpose(1, 2)).transpose(1, 2).reshape(B, T, D)
            x = x + self.attn.proj(out)
            h = self.norm2(x)
            x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
            return x

    class TViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = tnn.Parameter(torch.randn(1, 1, c.embed_dim) * 0.02)
            self.pos_embed = tnn.Parameter(torch.randn(1, c.seq_len, c.embed_dim) * 0.02)
            self.patch_embed = tnn.Module()
            self.patch_embed.proj = tnn.Conv2d(3, c.embed_dim, c.patch_size, c.patch_size)
            self.blocks = tnn.ModuleList([TBlock() for _ in range(c.depth)])
            self.norm = tnn.LayerNorm(c.embed_dim, eps=c.layernorm_eps)

        def forward(self, x):
            B = x.shape[0]
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
            x = x + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)

    tvit = TViT().eval()
    sd = {k: v.detach().numpy() for k, v in tvit.state_dict().items()}
    variables = convert_timm_state_dict(sd, c)

    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tvit(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    model = VisionTransformer(c)
    got, _ = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_preprocess_images():
    from PIL import Image

    img = Image.fromarray((np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8))
    out = preprocess_images([img], image_size=32)
    assert out.shape == (1, 32, 32, 3)
    assert out.min() >= -1.001 and out.max() <= 1.001


def test_clip_converter_parity():
    """Tiny HF CLIPVisionModel vs the flax CLIP tower (vit_openai path,
    reference models/mm_s2s_transformer.py:286-288, 298-306): all hidden
    states must match (the reference consumes output_hidden_states)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from mm_s2ut.models.vit import (
        CLIPVisionConfig, CLIPVisionTransformer, convert_clip_state_dict,
    )

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
    )
    torch.manual_seed(0)
    tmodel = transformers.CLIPVisionModel(hf_cfg).eval()

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0,
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_clip_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    px = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = tmodel(
            pixel_values=torch.tensor(px.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    model = CLIPVisionTransformer(cfg)
    states = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(px)
    )
    assert len(states) == len(out.hidden_states)
    for got, want in zip(states, out.hidden_states):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), atol=2e-5, rtol=1e-4
        )


def test_preprocess_modes():
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from mm_s2ut.models.vit import CLIP_MEAN, CLIP_STD, preprocess_images

    img = Image.fromarray(
        (np.random.RandomState(0).rand(40, 60, 3) * 255).astype(np.uint8)
    )
    a = preprocess_images([img], 32, mode="timm")
    b = preprocess_images([img], 32, mode="vit_openai")
    c = preprocess_images([img], 32, mode="vit_huggingface")
    assert a.shape == b.shape == c.shape == (1, 32, 32, 3)
    # CLIP center-crops after shortest-side resize, so content differs from
    # the squashed variants; normalization stats differ too.
    assert not np.allclose(a, b)
    # vit_huggingface uses bilinear vs timm's bicubic: close but not equal.
    assert not np.array_equal(a, c)
    with pytest.raises(ValueError):
        preprocess_images([img], 32, mode="bogus")
