from mm_s2ut.ops.fbank import (  # noqa: F401
    FbankConfig,
    batched_log_mel_fbank,
    log_mel_fbank,
    standardize,
)
from mm_s2ut.ops.attention import attention, flash_attention, reference_attention  # noqa: F401
from mm_s2ut.ops.ctc import ctc_greedy_decode, ctc_loss  # noqa: F401
from mm_s2ut.ops.kmeans import KMeansQuantizer, dedup_units, kmeans_assign, kmeans_fit  # noqa: F401
from mm_s2ut.ops.noise import add_noise, add_white_noise  # noqa: F401
