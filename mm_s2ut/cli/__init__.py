"""CLI entry points.

Importing this package (which every ``python -m mm_s2ut.cli.*`` run does
before jax initializes) points jax at a persistent compilation cache:
the decode/beam/vocoder programs take tens of seconds to compile per
shape, and repeated CLI invocations (the inference_all loop, re-runs of
train on the same config) hit the same shapes every time. Override or
disable with JAX_COMPILATION_CACHE_DIR (empty string disables).
"""
import os

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
        "~/.cache/mm_s2ut_jax"
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

# MM_S2UT_FORCE_CPU=1 pins every CLI to the CPU backend regardless of what
# backends the host's sitecustomize registers (some environments register
# an accelerator plugin at interpreter start, which ignores JAX_PLATFORMS
# from the environment — only a post-import config update wins). Used for
# hermetic functional runs (e.g. scripts_dev/verify_drive.py) where
# accelerator compile latency is not the thing under test.
if os.environ.get("MM_S2UT_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
