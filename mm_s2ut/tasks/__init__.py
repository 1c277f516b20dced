from mm_s2ut.tasks.s2s_task import MultiModalSpeechToSpeechTask  # noqa: F401
