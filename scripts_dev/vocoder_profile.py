"""Per-stage timing of the CodeHiFiGAN generator at the bench operating
point (B=32, 800 frames): which stage owns the ~170 ms."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mm_s2ut_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mm_s2ut.models.hifigan import CodeHiFiGAN, HiFiGANConfig, HiFiGANGenerator

B, FRAMES = 32, 800
cfg = HiFiGANConfig()
DT = jnp.bfloat16


def timed(fn, *args, n1=2, n2=8):
    f = jax.jit(fn, static_argnums=())
    float(f(*args))  # compile + force completion (host fetch; the relay's
    # block_until_ready is not a reliable barrier)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        float(out)
        return time.perf_counter() - t0

    run(n1)
    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1)


rng = np.random.RandomState(0)

# Full vocoder.
voc = CodeHiFiGAN(cfg, max_frames=FRAMES, dtype=DT)
units = jnp.asarray(rng.randint(0, 1000, (B, 200)), jnp.int32)
lens = jnp.full((B,), 200, jnp.int32)
vp = voc.init(jax.random.PRNGKey(0), units, lens)
t_full = timed(lambda p, u, l: voc.apply(p, u, l)[0].sum(), vp, units, lens)
print(f"full vocoder: {t_full*1e3:.2f} ms")

# Generator only.
gen = HiFiGANGenerator(cfg, dtype=DT)
x0 = jnp.asarray(rng.randn(B, FRAMES, cfg.model_in_dim), DT)
gp = gen.init(jax.random.PRNGKey(0), x0)
t_gen = timed(lambda p, x: gen.apply(p, x).sum(), gp, x0)
print(f"generator:    {t_gen*1e3:.2f} ms")

# Per-stage: run a single upsample stage + its 3 resblocks standalone.
from flax import linen as nn
from mm_s2ut.models.hifigan import LRELU_SLOPE, ResBlock


class Stage(nn.Module):
    cfg: HiFiGANConfig
    i: int
    dtype: object = DT
    skip_res: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        i = self.i
        rate, k = c.upsample_rates[i], c.upsample_kernel_sizes[i]
        ch = c.upsample_initial_channel // (2 ** (i + 1))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.ConvTranspose(ch, (k,), strides=(rate,), padding="VALID",
                             dtype=self.dtype, name=f"ups_{i}")(x)
        trim = (k - rate) // 2
        if trim > 0:
            x = x[:, trim:-trim]
        if self.skip_res:
            return x
        n_res = len(c.resblock_kernel_sizes)
        acc = None
        for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
            h = ResBlock(ch, rk, tuple(rd), dtype=self.dtype, name=f"res_{j}")(x)
            acc = h if acc is None else acc + h
        return acc / n_res


T = FRAMES
ch_in = cfg.upsample_initial_channel
for i, rate in enumerate(cfg.upsample_rates):
    x = jnp.asarray(rng.randn(B, T, ch_in), DT)
    for skip in (False, True):
        st = Stage(cfg, i, skip_res=skip)
        sp = st.init(jax.random.PRNGKey(0), x)
        t = timed(lambda p, xx: st.apply(p, xx).sum(), sp, x)
        tag = "ups-only" if skip else "ups+mrf "
        print(f"stage {i} ({tag}) T_in={T:7d} C_out={cfg.upsample_initial_channel // (2**(i+1)):4d}: {t*1e3:7.2f} ms")
    T *= rate
    ch_in = cfg.upsample_initial_channel // (2 ** (i + 1))

# Folded vs per-block MRF comparison.
gen_u = HiFiGANGenerator(cfg, dtype=DT, folded_mrf=False)
gen_f = HiFiGANGenerator(cfg, dtype=DT, folded_mrf=True)
pg = gen_u.init(jax.random.PRNGKey(0), x0)
t_u = timed(lambda p, x: gen_u.apply(p, x).sum(), pg, x0)
t_f = timed(lambda p, x: gen_f.apply(p, x).sum(), pg, x0)
print(f"generator per-block: {t_u*1e3:.2f} ms | folded: {t_f*1e3:.2f} ms")
