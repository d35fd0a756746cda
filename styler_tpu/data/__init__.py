from styler_tpu.data.dataset import (  # noqa: F401
    Dataset,
    batch_iterator,
    pad_batch,
    process_meta,
    strip_host_fields,
)
from styler_tpu.data.audio_io import (  # noqa: F401
    audioread,
    audiowrite,
    read_wav,
    read_wav_int,
)
from styler_tpu.data.textgrid import (  # noqa: F401
    alignment_from_file,
    get_alignment,
    read_textgrid,
)
from styler_tpu.data.sentences import sentences  # noqa: F401
