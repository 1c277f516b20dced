"""mm_s2ut — TPU-native multimodal speech-to-unit translation framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
VisualTrans reference (whxhcj/multimodal-S2UT): textless speech-to-speech
translation via discrete units, augmented with visual features.

Public surface preserved from the reference:
  * TSV manifest schema (reference data/speech_to_speech_dataset.py:526-531)
  * ``multimodal_s2ut_transformer.yaml`` config keys (reference config/)
  * ``python -m mm_s2ut.inference`` CLI (reference README.md:203-214)
  * generate-*.txt → .unit → wav → ASR → BLEU artifact chain

Importing this package registers all tasks/models/criterions, mirroring the
reference plugin's ``--user-dir`` auto-registration
(reference mm_s2ut/__init__.py:1).
"""

__version__ = "0.1.0"

from mm_s2ut import registry  # noqa: F401


def _register_all() -> None:
    # Import for registration side effects (tasks/models/criterions register
    # themselves with mm_s2ut.registry, the TPU-native analog of fairseq's
    # @register_task / @register_model user-dir scan).
    from mm_s2ut import tasks  # noqa: F401
    from mm_s2ut import models  # noqa: F401
    from mm_s2ut.train import criterion  # noqa: F401


_register_all()
