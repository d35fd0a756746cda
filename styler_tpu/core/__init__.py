from styler_tpu.core.config import Config, bucket_for, default_config  # noqa: F401
from styler_tpu.core.checkpoint import (  # noqa: F401
    latest_step,
    load_reference_checkpoint,
    load_reference_hifigan,
    restore_checkpoint,
    save_checkpoint,
)
from styler_tpu.core.import_torch import (  # noqa: F401
    import_hifigan_state,
    import_styler_state,
)
