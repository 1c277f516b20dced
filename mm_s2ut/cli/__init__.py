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
