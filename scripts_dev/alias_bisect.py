"""Bisect: which beam_search feature makes XLA copy the KV carry per step?

The e2e bench trace shows TWO full int8-cache copies per decode step
inside the segmented while loops (2.4 ms/step at cap 201 — more than the
attention kernel itself), while the plain scan(decode_step) probe aliases
the same carry in place. This repro builds a small while loop around the
real Pallas ancestry kernel + DUS write and toggles one candidate feature
at a time, then counts same-shape copies of the cache in the optimized
HLO (compiled.as_text()).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts_dev/alias_bisect.py
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from mm_s2ut.ops import decode_attention as da

B, L, H, T, S, Dh = 4, 2, 2, 64, 5, 64
TS = T * S
V = 64
K = S
MAXLEN = T - 1


def build(mode: str):
    """mode selects the loop structure; returns a jitted fn of (kv0,...)."""

    def body_core(step, kv, q, flat_rep):
        acc = q
        for layer in range(L):
            acc = acc + da.ancestry_decode_attention(
                q + 0.01 * acc, q, q, kv, flat_rep, layer
            )
        new_rows = jnp.broadcast_to(
            acc.mean(axis=(1, 2, 3))[:, None, None, None, None],
            (B, L, H, S, 2 * Dh),
        ).astype(kv.dtype)
        kv = jax.lax.dynamic_update_slice_in_dim(kv, new_rows, step * S, axis=3)
        return kv, acc

    if mode in ("while_simple_cond", "while_complex_cond", "while_gather",
                "while_fin", "while_all"):

        @jax.jit
        def run(kv0, q, flat_rep, alive_logp, fin_flags, fin_scores, anc):
            def cond(c):
                step, kv, alive_logp, fin_flags, fin_scores, anc, acc = c
                not_done = step < MAXLEN
                if mode == "while_simple_cond":
                    return not_done
                best_alive = alive_logp[:, 0]
                worst_fin = jnp.where(fin_flags, fin_scores, -1e9).min(axis=1)
                improvable = jnp.any(
                    jnp.logical_or(~fin_flags.all(axis=1), best_alive > worst_fin)
                )
                return jnp.logical_and(not_done, improvable)

            def body(c):
                step, kv, alive_logp, fin_flags, fin_scores, anc, acc = c
                kv, acc = body_core(step, kv, q, flat_rep)
                logits = acc.reshape(B, -1)[:, :V]
                if mode in ("while_fin", "while_all", "while_complex_cond",
                            "while_gather"):
                    s1, i1 = jax.lax.top_k(logits.astype(jnp.float32), K)
                    alive_logp = s1[:, :K]
                    fin_flags = fin_flags | (i1[:, :K] == 2)
                    fin_scores = jnp.maximum(fin_scores, s1[:, :K])
                if mode in ("while_gather", "while_all"):
                    src = jnp.argsort(alive_logp, axis=1)[:, :K]
                    anc = jnp.take_along_axis(anc, src[..., None], axis=1)
                    anc = jax.lax.dynamic_update_slice_in_dim(
                        anc, src[..., None].astype(anc.dtype), step, axis=2
                    )
                return (step + 1, kv, alive_logp, fin_flags, fin_scores, anc, acc)

            c = (jnp.zeros((), jnp.int32), kv0, alive_logp, fin_flags,
                 fin_scores, anc, q)
            c = jax.lax.while_loop(cond, body, c)
            return c[2].sum() + c[6].sum()

        return run

    if mode == "scan":

        @jax.jit
        def run(kv0, q, flat_rep, alive_logp, fin_flags, fin_scores, anc):
            def body(c, _):
                step, kv, acc = c
                kv, acc = body_core(step, kv, q, flat_rep)
                return (step + 1, kv, acc), ()

            (step, kv, acc), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.int32), kv0, q), None, length=MAXLEN
            )
            return acc.sum()

        return run

    raise ValueError(mode)


def main():
    rng = np.random.RandomState(0)
    kv0 = jnp.zeros((B, L, H, TS, 2 * Dh), jnp.bfloat16)
    q = jnp.asarray(rng.randn(B, H, K, Dh), jnp.bfloat16)
    anc = jnp.zeros((B, K, T), jnp.int32)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    flat_idx = jnp.where(t_idx < 1, t_idx * S + anc, -1)
    flat_rep = jnp.repeat(flat_idx, S, axis=2).astype(jnp.int32)
    alive_logp = jnp.zeros((B, K), jnp.float32)
    fin_flags = jnp.zeros((B, K), bool)
    fin_scores = jnp.full((B, K), -1e9, jnp.float32)

    for mode in ("scan", "while_simple_cond", "while_complex_cond",
                 "while_fin", "while_gather", "while_all"):
        fn = build(mode)
        compiled = fn.lower(
            kv0, q, flat_rep, alive_logp, fin_flags, fin_scores, anc
        ).compile()
        txt = compiled.as_text()
        shape = f"bf16[{B},{L},{H},{TS},{2*Dh}]"
        n_copies = sum(
            1 for line in txt.splitlines()
            if " copy(" in line and line.lstrip().startswith(f"%copy") is False
            and f"{shape}" in line and "copy(" in line and "fusion" not in line
        )
        # simpler: count copy instructions whose output is the cache shape
        n_copies = sum(
            1 for line in txt.splitlines()
            if f"= {shape}" in line.replace(" ", "")
            and "copy(" in line
        )
        print(f"{mode:20s}: cache-shaped copies in optimized HLO = {n_copies}")


if __name__ == "__main__":
    main()
