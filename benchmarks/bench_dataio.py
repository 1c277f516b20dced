"""Benchmark: host-side audio decode throughput — native C++ thread pool
vs single-thread Python decode.

The reference's input pipeline decodes audio in fairseq DataLoader worker
subprocesses (--num-workers 8, scripts/textless/1_train.sh:125); SURVEY.md
flags Python-side fbank/decode as a known host bottleneck. This repo's
data layer decodes WAVs in a GIL-free C++ thread pool straight into padded
batch buffers (mm_s2ut/native/audioio.cpp). This bench quantifies that
choice on this host: MB/s and utterances/s for both paths over a synthetic
16 kHz corpus (10 s utterances), plus the pure-Python audio_io fallback.

Prints one JSON line per measurement. Env: DIO_N (wavs), DIO_THREADS.

Caveat for this dev container: nproc=1, so the thread pool can only lose
here (scheduling overhead, no parallelism) and numpy's SIMD int16→f32
narrowly beats the C++ loop. The pool's win is GIL-free multi-core decode
on real TPU hosts; single-thread the two paths are within ~10% after the
PCM16 fast path + -march=native (580 → 1242 MB/s measured).
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mm_s2ut import native  # noqa: F811
    from mm_s2ut.data.audio_io import get_waveform, write_wav

    N = int(os.environ.get("DIO_N", "256"))
    THREADS = int(os.environ.get("DIO_THREADS", "8"))
    SR, SECONDS = 16000, 10
    n_samples = SR * SECONDS

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_dataio_")
    paths = []
    for i in range(N):
        wav = (rng.randn(n_samples) * 0.1).astype(np.float32)
        p = os.path.join(tmp, f"{i}.wav")
        write_wav(p, wav, SR)
        paths.append(p)
    total_mb = N * n_samples * 2 / 1e6  # 16-bit PCM payload

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    if native.available():
        t = timed(lambda: native.load_batch(paths, n_samples, THREADS))
        results[f"native_pool_{THREADS}t"] = t
        t1 = timed(lambda: native.load_batch(paths, n_samples, 1))
        results["native_1t"] = t1

    def py_decode():
        for p in paths:
            get_waveform(p)

    results["python_1t"] = timed(py_decode)

    for name, t in results.items():
        print(json.dumps({
            "metric": f"dataio_{name}",
            "value": round(N / t, 1),
            "unit": "utt/s",
            "extra": {"mb_per_s": round(total_mb / t, 1), "n": N,
                      "sec": round(t, 4)},
        }))

    for p in paths:
        os.unlink(p)
    os.rmdir(tmp)


if __name__ == "__main__":
    main()
