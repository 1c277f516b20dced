"""Pallas row-permute kernel: permute rows of a big buffer at DMA speed.

Historical role: beam search permuted the stacked self-attention KV
cache every step (SURVEY.md F6 / §7 hard part 2), and XLA's in-loop
lowerings top out well below copy bandwidth on TPU (measured at
(40, 2·6·201·8·64) bf16: lax.gather ≈ 119 GB/s, per-row
dynamic-slice+stack ≈ 233 GB/s); this kernel recovered copy bandwidth by
scalar-prefetching the permutation and streaming (row, chunk) blocks
HBM→VMEM→HBM with double buffering.

The decode path has since moved past it: the ancestry-indexed cache
(ops/decode_attention.py) removed the per-step permutation entirely, so
beam search no longer calls this. It remains as a general tested
utility for leading-axis permutations of large device buffers (e.g.
corpus-order shuffles of resident feature stores).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(idx_ref, in_ref, out_ref):
    out_ref[...] = in_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def reorder_rows(x: jnp.ndarray, indices: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """out[i] = x[indices[i]] over the leading axis. x: (N, ...) with the
    trailing dims' product a multiple of 128."""
    N = x.shape[0]
    rest = x.shape[1:]
    R = 1
    for d in rest:
        R *= d
    rows = R // 128
    x3 = x.reshape(N, rows, 128)
    # Sublane block: S | rows, S % 8 == 0, block ≤ ~2 MB (largest wins —
    # per-block DMA issue overhead dominates below ~1 MB); fall back to
    # the full row dim (always legal).
    limit = 2 * 1024 * 1024 // (128 * x.dtype.itemsize)
    S = rows
    for cand in range(min(rows, limit), 7, -1):
        if rows % cand == 0 and cand % 8 == 0:
            S = cand
            break
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, rows // S),
            in_specs=[
                # index_map args: grid indices first, then scalar-prefetch refs
                pl.BlockSpec((1, S, 128), lambda i, c, idx: (idx[i], c, 0)),
            ],
            out_specs=pl.BlockSpec((1, S, 128), lambda i, c, idx: (i, c, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((N, rows, 128), x.dtype),
        interpret=interpret,
    )(indices.astype(jnp.int32), x3)
    return out.reshape(N, *rest)


def supported(x: jnp.ndarray) -> bool:
    R = 1
    for d in x.shape[1:]:
        R *= d
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    return on_tpu and R % 128 == 0
