from mm_s2ut.tasks.s2s_task import MultiModalSpeechToSpeechTask  # noqa: F401
from mm_s2ut.tasks.s2t_task import MultiModalSpeechToTextTask  # noqa: F401
