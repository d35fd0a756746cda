from styler_tpu.dsp.mel import (  # noqa: F401
    MelFrontend,
    dynamic_range_compression,
    dynamic_range_decompression,
    frame_signal,
    griffin_lim,
    hann_periodic,
    mel_filterbank,
    stft_magnitude,
)
from styler_tpu.dsp.features import (  # noqa: F401
    bucketize,
    energy_bin_edges,
    energy_rescaling_np,
    f0_normalization_np,
    pitch_bin_edges,
    quantize_one_hot,
    speaker_normalization_np,
)
