from styler_tpu.vocoder.hifigan import (  # noqa: F401
    Generator,
    HiFiGANConfig,
    vocode,
)
