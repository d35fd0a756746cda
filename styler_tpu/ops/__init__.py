from styler_tpu.ops.masking import mask_from_lengths, masked_fill  # noqa: F401
from styler_tpu.ops.regulate import (  # noqa: F401
    calibration_matrix,
    duration_to_alignment,
    length_regulate,
    mel_calibrate,
)
from styler_tpu.ops.grl import gradient_reversal  # noqa: F401
from styler_tpu.ops.recurrent import (  # noqa: F401
    bilstm,
    flip_padded,
    init_bilstm_params,
)
from styler_tpu.ops.position import sinusoid_table  # noqa: F401
