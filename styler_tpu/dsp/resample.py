"""Sample-rate conversion for corpus preparation.

The reference resamples its corpus by shelling out to ffmpeg
(reference data/resample.sh); here wav inputs are resampled in-process:

1. ``native``: `styler_resample` in native/libstyler_dsp.so — a
   multithreaded rational polyphase (windowed-sinc, Kaiser 5.0)
   resampler with scipy.signal.resample_poly's exact default filter
   design, ctypes-loaded.
2. Fallback: scipy.signal.resample_poly (numerically identical design).

ffmpeg remains only for non-wav codecs (data/resample.sh handles .flac).
"""

from __future__ import annotations

import ctypes
from math import gcd

import numpy as np

from styler_tpu.dsp.pitch import _load_native

_bound = False


def _lib():
    global _bound
    lib = _load_native()
    if lib is not None and not _bound:
        lib.styler_resample_len.restype = ctypes.c_long
        lib.styler_resample_len.argtypes = [
            ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ]
        lib.styler_resample.restype = ctypes.c_int
        lib.styler_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _bound = True
    return lib


def resample_len(n_in: int, sr_in: int, sr_out: int) -> int:
    """Output length (scipy resample_poly convention: ceil(n*up/down))."""
    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    return -(-n_in * up // down)


def resample(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """wav [n] float -> [resample_len(n)] float32 at sr_out."""
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if sr_in == sr_out:
        return wav.copy()
    lib = _lib()
    if lib is not None:
        out = np.empty(resample_len(len(wav), sr_in, sr_out), np.float32)
        rc = lib.styler_resample(
            wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(wav), sr_in, sr_out,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return out
    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(
        wav.astype(np.float64), sr_out // g, sr_in // g
    ).astype(np.float32)
