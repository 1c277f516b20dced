"""k-means unit quantization — assignment, training, and unit-sequence
beam decode, all on device.

TPU-native equivalent of the reference's HuBERT unit codec (SURVEY.md
F12/C13; reference scripts/speech_to_speech_translation/mhubert.py:28-86
and the fairseq quantize_with_kmeans pipeline, scripts/preprocess/
3_cluster.sh:20-27): assignment is the matmul form ‖x‖² − 2xC + ‖C‖²
(one MXU GEMM per batch), Lloyd training runs as a jitted scan with
segment-sum updates, and the reference's custom beam search over top-k
candidate units (scoring dedup-length rate × distance rate) is kept as a
host-side decoder.
"""
from __future__ import annotations

from functools import partial
from itertools import groupby
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def squared_distances(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(N, D) × (K, D) → (N, K) squared euclidean distances via the GEMM
    identity ‖x‖² − 2x·Cᵀ + ‖C‖² (reference mhubert.py:49-53)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(centroids * centroids, axis=-1)[None, :]
    cross = x @ centroids.T
    return x2 - 2.0 * cross + c2


@jax.jit
def kmeans_assign(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(..., D) features → (...,) nearest-centroid indices."""
    flat = x.reshape(-1, x.shape[-1])
    idx = jnp.argmin(squared_distances(flat, centroids), axis=-1)
    return idx.reshape(x.shape[:-1])


@partial(jax.jit, static_argnames=("n_steps",))
def kmeans_fit(
    key: jax.Array,
    x: jnp.ndarray,  # (N, D)
    init_centroids: jnp.ndarray,  # (K, D)
    n_steps: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd iterations as a lax.scan. Empty clusters keep their previous
    centroid. Returns (centroids, inertia_per_step)."""
    K = init_centroids.shape[0]

    def step(centroids, _):
        d = squared_distances(x, centroids)
        assign = jnp.argmin(d, axis=-1)
        inertia = jnp.take_along_axis(d, assign[:, None], axis=1).sum()
        one_hot = jax.nn.one_hot(assign, K, dtype=x.dtype)  # (N, K)
        counts = one_hot.sum(axis=0)  # (K,)
        sums = one_hot.T @ x  # (K, D) MXU
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids
        )
        return new, inertia

    return jax.lax.scan(step, init_centroids, None, length=n_steps)


def kmeans_plusplus_init(
    key: jax.Array, x: jnp.ndarray, k: int, oversample: int = 4
) -> jnp.ndarray:
    """Cheap k-means|| style init: sample k·oversample candidates uniformly,
    then greedily keep k far-apart ones (device-side, static shapes)."""
    n = x.shape[0]
    cand_idx = jax.random.choice(key, n, (k * oversample,), replace=False if n >= k * oversample else True)
    cand = x[cand_idx]
    first = cand[:1]

    def pick(carry, _):
        chosen, count = carry
        d = squared_distances(cand, chosen).min(axis=-1)
        nxt = jnp.argmax(d)
        chosen = jax.lax.dynamic_update_slice_in_dim(chosen, cand[nxt][None], count, 0)
        return (chosen, count + 1), None

    # Fill ALL placeholder rows with the first centroid: zero-filled rows
    # would act as phantom origin centroids inside min(axis=-1), collapsing
    # the greedy far-point pick into farthest-from-origin sampling.
    # Duplicates of a real centroid are harmless (the min ignores them).
    chosen0 = jnp.broadcast_to(first, (k, x.shape[-1])).astype(x.dtype)
    (chosen, _), _ = jax.lax.scan(pick, (chosen0, jnp.asarray(1)), None, length=k - 1)
    return chosen


class KMeansQuantizer:
    """Loadable quantizer: sklearn joblib (reference km_path), .npy, or
    trained in-framework."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = jnp.asarray(centroids, jnp.float32)

    @classmethod
    def load(cls, path: str) -> "KMeansQuantizer":
        if str(path).endswith((".npy", ".npz")):
            arr = np.load(path)
            if hasattr(arr, "keys"):
                arr = arr[list(arr.keys())[0]]
            return cls(arr)
        import joblib  # sklearn MiniBatchKMeans pickle (reference format)

        km = joblib.load(path)
        return cls(np.asarray(km.cluster_centers_, np.float32))

    def save(self, path: str) -> None:
        np.save(path, np.asarray(self.centroids))

    @property
    def n_units(self) -> int:
        return int(self.centroids.shape[0])

    def __call__(self, features: np.ndarray | jnp.ndarray) -> np.ndarray:
        return np.asarray(kmeans_assign(jnp.asarray(features), self.centroids))

    def decode(
        self,
        features: np.ndarray,
        beamsearch: bool = False,
        top_k: int = 10,
        beamsize: int = 200,
    ) -> dict:
        """Reference HubertCode.decode surface (mhubert.py:48-86): greedy
        code + run-length merged code, plus the custom beam search scoring
        len-normalized dedup rate × distance rate (lower is better)."""
        d = np.asarray(squared_distances(jnp.asarray(features), self.centroids))
        dist = np.sqrt(np.maximum(d, 0.0))
        order = np.argsort(dist, axis=-1)[:, :top_k]
        values = np.take_along_axis(dist, order, axis=-1)
        code = order[:, 0]
        out = {
            "code": code,
            "distance": dist,
            # Residual to the assigned centroid (reference mhubert.py:62-67
            # 'center_diff' analysis field — nothing downstream consumes
            # it, kept for exact decode-surface parity).
            "center_diff": np.asarray(features, np.float32)
            - np.asarray(self.centroids)[code],
            "merged_code": [k for k, _ in groupby(code.tolist())],
        }
        if beamsearch:
            sequences: List[Tuple[List[int], float]] = [([], 1.0)]
            T = len(code)
            for i_row, v_row in zip(order, values):
                vsum = float(np.sum(v_row))
                all_candidates = []
                for tokens, score in sequences:
                    for k_i, v in zip(i_row, v_row):
                        cand_tokens = tokens + [int(k_i)]
                        norm_len_rate = len([k for k, _ in groupby(cand_tokens)]) / T
                        norm_dist_rate = float(v) / vsum
                        all_candidates.append(
                            (cand_tokens, score + norm_len_rate * norm_dist_rate)
                        )
                all_candidates.sort(key=lambda t: t[1])
                sequences = all_candidates[:beamsize]
            best = sequences[0][0]
            out["beam_code"] = np.asarray(best)
            out["beam_merged_code"] = [k for k, _ in groupby(best)]
        return out


def dedup_units(units: np.ndarray | List[int]) -> List[int]:
    """Run-length dedup (reference --reduce-unit / groupby postprocess,
    SURVEY.md C18(d))."""
    return [k for k, _ in groupby(list(units))]
