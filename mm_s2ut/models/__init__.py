from mm_s2ut.models import layers, fusion, s2t_encoder, decoder  # noqa: F401
from mm_s2ut.models.mm_s2ut import MMS2UTModel  # noqa: F401
from mm_s2ut.models.mm_xm import MMXMTransformerModel  # noqa: F401


def build_model_from_config(cfg):
    """Config → model instance for inference/eval entry points: respects
    cfg.task (flagship S2UT vs enhanced S2T/XM) and the on-line
    visual-extractor graph overrides. Mirrors the tasks' build_model so a
    Trainer save dir is self-describing without constructing the task
    (which needs the training data root)."""
    mm = cfg.model.multimodal
    vit_cfg = None
    if mm.load_visual_extractor_type:
        from mm_s2ut.models.vit import CLIPVisionConfig, ViTConfig

        base = (
            CLIPVisionConfig if mm.load_visual_extractor_type == "vit_openai"
            else ViTConfig
        )
        args = dict(mm.visual_extractor_args)
        args.setdefault("image_size", mm.image_input_size)
        vit_cfg = base(**args)
    from mm_s2ut.models.wav2vec2 import Wav2Vec2Config

    w2v_cfg = Wav2Vec2Config.from_args(cfg.model.w2v_args)
    if cfg.task == "multimodal_speech_to_text":
        return MMXMTransformerModel(cfg.model, w2v_cfg=w2v_cfg)
    return MMS2UTModel(cfg.model, vit_cfg=vit_cfg, w2v_cfg=w2v_cfg)
