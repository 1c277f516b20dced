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


def marginal_ms(fn, n_small=2, n_big=12, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(n_small)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(n_big)
        t_b = time.perf_counter() - t0
        best = min(best, (t_b - t_s) / (n_big - n_small))
    return best * 1e3


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

    @jax.jit
    def fwd(p, b, k):
        return loss_fn(p, b, k, b["imgs_list"])

    @jax.jit
    def fwd_noimg(p, b, k):
        return loss_fn(p, b, k, ())

    @jax.jit
    def fwdbwd(p, b, k):
        l, g = jax.value_and_grad(lambda pp: loss_fn(pp, b, k, b["imgs_list"]))(p)
        return l, jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum(), g, jnp.zeros((), jnp.float32)
        )

    @jax.jit
    def enc(p, b, k):
        out = model.apply(
            p, b["src_features"], b["src_lengths"], b["imgs_list"],
            b["img_masks_list"], None, deterministic=False,
            rngs={"dropout": k, "modality": jax.random.fold_in(k, 7)},
            method=model.encode,
        )
        return out["encoder_out"].sum()

    tx = build_optimizer(TrainConfig(update_freq=1, warmup_updates=10))
    state = TrainState.create(params, tx)
    step_fn = jax.jit(make_train_step(model, criterion, tx, {"label_smoothing": 0.2}))
    step_fn_don = jax.jit(
        make_train_step(model, criterion, tx, {"label_smoothing": 0.2}),
        donate_argnums=(0,),
    )

    def run_simple(fn):
        def go(n):
            out = None
            for i in range(n):
                out = fn(params, batch, jax.random.fold_in(key, i))
            jax.block_until_ready(out)
        go(1)  # compile
        return marginal_ms(go)

    def make_run_full(fn):
        def run_full(n):
            nonlocal state
            m = None
            for _ in range(n):
                state, m = fn(state, batch, key)
            jax.block_until_ready(m["loss"])
        return run_full

    for tag, fn in (("fwd", fwd), ("fwd_noimg", fwd_noimg),
                    ("enc", enc), ("fwdbwd", fwdbwd)):
        print(f"{tag:10s} {run_simple(fn):8.2f} ms", flush=True)
    for tag, fn in (("full", step_fn), ("full_donate", step_fn_don)):
        r = make_run_full(fn)
        r(1)
        print(f"{tag:12s} {marginal_ms(r, n_big=22):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
