from mm_s2ut.models import layers, fusion, s2t_encoder, decoder  # noqa: F401
from mm_s2ut.models.mm_s2ut import MMS2UTModel  # noqa: F401
from mm_s2ut.models.mm_xm import MMXMTransformerModel  # noqa: F401
