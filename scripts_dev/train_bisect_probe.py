"""Bisect the train step's 18 ms at B=8, T_src=1000, Tt=100.

Times jitted sub-programs with two-point marginal timing:
  fwd        loss only (no grad)
  fwdbwd     loss + grads (no clip/Adam)
  full       the production train step (grads + clip + Adam + skip-guard)
  fwd_noimg  loss without the image fusion source
  enc        encoder (+fusion) only

  python scripts_dev/train_bisect_probe.py [B] [T] [Tt]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_cfg
from mm_s2ut import registry
from mm_s2ut.config import TrainConfig
from mm_s2ut.models.mm_s2ut import MMS2UTModel
from mm_s2ut.train.optimizer import build_optimizer
from mm_s2ut.train.trainer import TrainState, make_train_step


def scan_marginal_ms(make_scan, n_small=2, n_big=22, reps=3):
    """make_scan(n) -> callable() running n iterations inside ONE jit.
    Times the marginal between the two compiled programs — per-dispatch
    relay jitter (0.1-1 s) otherwise swamps ms-scale step times."""
    from bench import two_point_marginal

    fns = {n_small: make_scan(n_small), n_big: make_scan(n_big)}
    fns[n_small]()
    fns[n_big]()  # compile + warm

    def timed(n):
        t0 = time.perf_counter()
        fns[n]()
        return time.perf_counter() - t0

    return two_point_marginal(timed, n_small, n_big, reps)[0] * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    Tt = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    cfg = _flagship_cfg()
    model = MMS2UTModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "src_features": rng.randn(B, T, 80).astype(np.float32),
        "src_lengths": np.full((B,), T, np.int32),
        "prev_output_tokens": rng.randint(4, cfg.vocab_size, (B, Tt)).astype(np.int32),
        "target": rng.randint(4, cfg.vocab_size, (B, Tt)).astype(np.int32),
        "imgs_list": (rng.randn(B, 577, 768).astype(np.float32),),
        "img_masks_list": (np.zeros((B, 577), bool),),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["src_features"], batch["src_lengths"],
        batch["prev_output_tokens"], batch["imgs_list"], batch["img_masks_list"],
    )
    criterion = registry.get_criterion("speech_to_unit")
    key = jax.random.PRNGKey(1)
    batch = jax.device_put(batch)
    params = jax.device_put(params)

    def loss_fn(p, b, k, imgs):
        out = model.apply(
            p, b["src_features"], b["src_lengths"], b["prev_output_tokens"],
            imgs, b["img_masks_list"] if imgs else (),
            deterministic=False,
            rngs={"dropout": k, "modality": jax.random.fold_in(k, 7)},
        )
        l, _ = criterion(out, b, label_smoothing=0.2)
        return l

    tx = build_optimizer(TrainConfig(update_freq=1, warmup_updates=10))
    state0 = TrainState.create(params, tx)
    step_fn = make_train_step(model, criterion, tx, {"label_smoothing": 0.2})

    from functools import partial

    def scan_of(per_iter, base_key=None):
        """per_iter(params, batch, key_i) -> scalar; scans n in one jit.
        params/batch are jit ARGUMENTS — captured as constants they embed
        280 MB in the HLO and blow the relay's compile-request limit."""
        bk = key if base_key is None else base_key

        def make(n):
            @jax.jit
            def prog(p, b):
                def body(c, i):
                    return c + per_iter(p, b, jax.random.fold_in(bk, i)), None
                out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
                return out
            return lambda: jax.block_until_ready(prog(params, batch))
        return make

    fwd_iter = lambda p, b, k: loss_fn(p, b, k, b["imgs_list"])
    fwd_noimg_iter = lambda p, b, k: loss_fn(p, b, k, ())

    def enc_iter(p, b, k):
        out = model.apply(
            p, b["src_features"], b["src_lengths"],
            b["imgs_list"], b["img_masks_list"], None,
            deterministic=False,
            rngs={"dropout": k, "modality": jax.random.fold_in(k, 7)},
            method=model.encode,
        )
        return out["encoder_out"].astype(jnp.float32).sum()

    def enc_det_iter(p, b, k):
        out = model.apply(
            p, b["src_features"], b["src_lengths"],
            b["imgs_list"], b["img_masks_list"], None,
            deterministic=True, method=model.encode,
        )
        # Keep a key dependency so the scan can't hoist the iteration.
        return out["encoder_out"].astype(jnp.float32).sum() + (
            jax.random.uniform(k, ()) * 0.0
        )


    def fwdbwd_iter(p, b, k):
        l, g = jax.value_and_grad(
            lambda pp: loss_fn(pp, b, k, b["imgs_list"])
        )(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + x.astype(jnp.float32).sum(), g,
            jnp.zeros((), jnp.float32),
        )

    def make_full(n):
        @jax.jit
        def prog(st, b):
            def body(s, i):
                s, m = step_fn(s, b, jax.random.fold_in(key, i))
                return s, m["loss"]
            _, losses = jax.lax.scan(body, st, jnp.arange(n))
            return losses[-1]
        return lambda: jax.block_until_ready(prog(state0, batch))

    key_rbg = jax.random.key(1, impl="rbg")
    for tag, mk in (
        ("fwd", scan_of(fwd_iter)),
        ("fwd_rbg", scan_of(fwd_iter, base_key=key_rbg)),
        ("fwd_noimg", scan_of(fwd_noimg_iter)),
        ("enc", scan_of(enc_iter)),
        ("enc_det", scan_of(enc_det_iter)),
        ("fwdbwd", scan_of(fwdbwd_iter)),
        ("fwdbwd_rbg", scan_of(fwdbwd_iter, base_key=key_rbg)),
        ("full", make_full),
    ):
        print(f"{tag:10s} {scan_marginal_ms(mk):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
