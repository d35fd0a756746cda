from styler_tpu.speaker.rescnn import (  # noqa: F401
    ResCNN,
    import_deepspeaker_h5,
)
from styler_tpu.speaker.encoder import (  # noqa: F401
    CosineClassifier,
    SpeakerEncoder,
)
from styler_tpu.speaker.features import (  # noqa: F401
    NUM_FBANKS,
    NUM_FRAMES,
    fbank_features,
    normalize_frames,
    speaker_features_from_audio,
    trim_silence,
)
