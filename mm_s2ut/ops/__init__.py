from mm_s2ut.ops.fbank import FbankConfig, log_mel_fbank, batched_log_mel_fbank  # noqa: F401
