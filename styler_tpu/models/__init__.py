from styler_tpu.models.styler import STYLER, StylerOutput  # noqa: F401
from styler_tpu.models.style_modeling import (  # noqa: F401
    StyleModeling,
    StyleModelingOutput,
)
from styler_tpu.models.transformer import (  # noqa: F401
    FFTBlock,
    MelDecoder,
    PostNet,
    TextEncoder,
)
from styler_tpu.models.audio_encoder import AudioEncoder, BiLSTM  # noqa: F401
from styler_tpu.models.predictors import (  # noqa: F401
    AugmentationClassifier,
    StylePredictor,
)
