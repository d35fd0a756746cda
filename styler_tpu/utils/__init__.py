from styler_tpu.utils.logging import (  # noqa: F401
    StepTimer,
    SummaryLogger,
    annotate,
    profile_trace,
)
from styler_tpu.utils.plotting import (  # noqa: F401
    alignment_2d_from_durations,
    figure_to_array,
    plot_alignment,
    plot_mel_f0_energy,
    plot_spectrogram,
    save_figure,
)
