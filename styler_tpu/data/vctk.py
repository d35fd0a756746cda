"""VCTK offline preprocessing (reference data/vctk.py + preprocess.py).

Same on-disk contract: per utterance 6 npy files + filelists + stat.txt;
train/val split = first shuffled utterance per speaker → val, seeded 9420
(reference vctk.py:56-132). Differences are implementation-level only:

- mel/energy come from the jitted JAX MelFrontend instead of torch STFT,
- f0 from styler_tpu.dsp.pitch (native C++ backend when built),
- speaker embeddings from the JAX ResCNN port when the Keras ``.h5``
  checkpoint is available; otherwise a deterministic fallback embedding
  is written with a warning so the pipeline stays runnable end-to-end.
"""

from __future__ import annotations

import os
import random
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from styler_tpu.core.config import Config
from styler_tpu.data.audio_io import read_wav_int
from styler_tpu.data.textgrid import alignment_from_file
from styler_tpu.dsp.features import energy_rescaling_np, f0_normalization_np
from styler_tpu.dsp.mel import MelFrontend
from styler_tpu.dsp.pitch import get_f0, track_f0_batch
from styler_tpu.textproc.cleaners import CLEANERS

SUBDIRS = (
    "mel_clean",
    "mel_aug",
    "alignment",
    "f0",
    "f0_norm",
    "f0_norm_aug",
    "energy",
    "energy_0to1",
    "energy_0to1_aug",
    "spker_embed",
)


def ensure_dirs(out_dir: str) -> None:
    for d in SUBDIRS:
        os.makedirs(os.path.join(out_dir, d), exist_ok=True)


def prepare_align(in_dir: str, config: Config) -> None:
    """Clean transcripts in place (reference vctk.py:27-40)."""
    for dirpath, _, filenames in os.walk(in_dir):
        for file in filenames:
            if not file.endswith(".txt"):
                continue
            path = os.path.join(dirpath, file)
            with open(path, encoding="utf-8") as f:
                lines = f.readlines()
            text = lines[0]
            for name in config.text_cleaners:
                text = CLEANERS[name](text)
            with open(path, "w", encoding="utf-8") as f:
                f.write(text)


def mfa_align(in_dir: str, out_dir: str, mfa_path: str = "./montreal-forced-aligner") -> str:
    """Shell out to the Montreal Forced Aligner (reference utils.py:25-37).
    Kept as an external data-prep tool exactly like the reference."""
    import subprocess

    mfa_out_dir = os.path.join(out_dir, "TextGrid")
    cmd = [
        os.path.join(mfa_path, "bin", "mfa_align"),
        in_dir,
        os.path.join(mfa_path, "pretrained_models", "librispeech-lexicon.txt"),
        "english",
        mfa_out_dir,
        "-j",
        "8",
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=False)
    return mfa_out_dir


def default_speaker_asset() -> Optional[str]:
    """Path to the committed on-box-trained speaker encoder
    (cli/train_speaker.py), or None."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "assets", "speaker", "encoder_gen.npz",
    )
    return path if os.path.exists(path) else None


class SpeakerEmbedder:
    """JAX speaker embedder with a three-tier resolution:

    1. the reference's pretrained DeepSpeaker ``.h5`` when present
       (parity tier — reference embedding.py:8-24),
    2. the committed on-box-trained :class:`SpeakerEncoder` asset
       (``assets/speaker/encoder_gen.npz``, cli/train_speaker.py —
       learned on the synthetic corpora; quality pinned in
       ``assets/speaker/encoder_eval.json``),
    3. the deterministic spectral-envelope fallback (quantified in
       tests/test_data.py::test_speaker_fallback_separates_speakers).

    ``backend`` pins a tier explicitly: "auto" (default), "h5",
    "native" (trained asset), or "fallback".
    """

    def __init__(self, config: Config, backend: str = "auto"):
        self.config = config
        self.model = None
        self.variables = None
        self._jitted = None
        h5 = config.speaker_embedder_dir
        native = default_speaker_asset()
        if backend not in ("auto", "h5", "native", "fallback"):
            raise ValueError(f"unknown speaker backend: {backend}")
        if backend in ("auto", "h5") and os.path.exists(h5):
            from styler_tpu.speaker import ResCNN, import_deepspeaker_h5

            self.model = ResCNN()
            self.variables = import_deepspeaker_h5(h5)
        elif backend == "h5":
            raise FileNotFoundError(h5)
        elif backend in ("auto", "native") and native:
            from styler_tpu.core.checkpoint import load_acoustic_npz
            from styler_tpu.speaker import SpeakerEncoder

            params, batch_stats = load_acoustic_npz(native)
            self.model = SpeakerEncoder()
            self.variables = {"params": params, "batch_stats": batch_stats}
            print(f"[vctk] speaker embedder: trained native asset {native}",
                  file=sys.stderr)
        elif backend == "native":
            raise FileNotFoundError("assets/speaker/encoder_gen.npz")
        elif backend == "auto":
            print(
                f"[vctk] speaker embedder checkpoint not found at {h5}; "
                "writing deterministic fallback embeddings",
                file=sys.stderr,
            )

    def embed_wav(self, audio: np.ndarray, rng=None) -> np.ndarray:
        if self.model is None:
            # Deterministic pseudo-embedding: the long-term average log
            # power spectrum of the energetic frames, integrated into 512
            # log-spaced bands (50 Hz..Nyquist) — a crude spectral-
            # envelope (formant) signature. Quantified on synthetic
            # 3-speaker corpora: 18/18 leave-one-out nearest-centroid
            # speaker ID, same-speaker cosine min > different-speaker
            # max (tests/test_data.py::test_speaker_fallback_separates;
            # bound recorded in PARITY.md). The previous stand-in (rFFT
            # of the first 1.49 s, bins 0-344 Hz only) scored 8/18.
            sr = self.config.sampling_rate
            frame, hop = 1024, 512
            dim = self.config.speaker_embed_dim
            x = audio.astype(np.float64)
            if len(x) < frame:
                x = np.pad(x, (0, frame - len(x)))
            nfr = 1 + (len(x) - frame) // hop
            idx = np.arange(frame)[None] + hop * np.arange(nfr)[:, None]
            frames = x[idx] * np.hanning(frame)
            P = np.abs(np.fft.rfft(frames, axis=1)) ** 2
            en = P.sum(axis=1)
            P = P[en >= np.quantile(en, 0.4)].mean(axis=0)
            freqs = np.fft.rfftfreq(frame, 1.0 / sr)
            edges = np.geomspace(50.0, sr / 2, dim + 1)
            band = np.searchsorted(edges, freqs) - 1
            valid = (band >= 0) & (band < dim)
            v = np.zeros(dim)
            cnt = np.zeros(dim)
            np.add.at(v, band[valid], P[valid])
            np.add.at(cnt, band[valid], 1)
            v = np.log(v / np.maximum(cnt, 1) + 1e-10)
            v -= v.mean()
            v /= np.linalg.norm(v) + 1e-9
            return v.astype(np.float32)[None, :]
        import jax.numpy as jnp

        from styler_tpu.speaker import speaker_features_from_audio

        feats = speaker_features_from_audio(
            audio,
            self.config.sampling_rate,
            self.config.win_length,
            rng=rng,
        )
        if self._jitted is None:
            import jax

            # eager flax apply costs one tunnel RPC per op on the axon
            # platform (CLAUDE.md) — embed through one compiled program
            self._jitted = jax.jit(self.model.apply)
        emb = self._jitted(self.variables, jnp.asarray(feats[None]))
        return np.asarray(emb)


def load_aligned(
    in_dir: str,
    out_dir: str,
    dirname,
    basename: str,
    config: Config,
) -> Optional[Tuple[np.ndarray, str, List[int]]]:
    """TextGrid + wav → (trimmed wav, {phoneme} text, durations); None if
    unaligned or the aligned span is empty (reference vctk.py:169-188)."""
    wav_path = os.path.join(in_dir, str(dirname), f"{basename}.wav")
    tg_path = os.path.join(out_dir, "TextGrid", str(dirname), f"{basename}.TextGrid")
    if not os.path.exists(tg_path):
        return None

    phone, duration, start, end = alignment_from_file(
        tg_path, config.sampling_rate, config.hop_length
    )
    text = "{" + "}{".join(phone) + "}"
    text = text.replace("{$}", " ").replace("}{", " ")
    if start >= end:
        return None

    sr, wav = read_wav_int(wav_path)
    wav = wav[
        int(config.sampling_rate * start): int(config.sampling_rate * end)
    ].astype(np.float32)
    return wav, text, duration


def process_utterance(
    in_dir: str,
    out_dir: str,
    dirname,
    basename: str,
    config: Config,
    frontend: MelFrontend,
    loaded: Optional[Tuple[np.ndarray, str, List[int]]] = None,
    f0: Optional[np.ndarray] = None,
    mel_energy: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Optional[Tuple[str, float, float, float, float, int]]:
    """One utterance → 6 npy files (reference vctk.py:167-224).

    ``loaded``/``f0``/``mel_energy`` let build_from_path reuse staged
    wavs and batch-computed features (the multithreaded host f0 tracker,
    dsp/pitch.py:track_f0_batch, or the fused on-device front end,
    dsp/preprocess.py); standalone callers omit them.
    """
    if loaded is None:
        loaded = load_aligned(in_dir, out_dir, dirname, basename, config)
    if loaded is None:
        return None
    wav, text, duration = loaded

    total = sum(duration)
    if f0 is None:
        f0 = get_f0(wav, config, duration)
    else:
        f0 = np.asarray(f0)[:total]

    if mel_energy is not None:
        mel, energy = mel_energy
    else:
        mel, energy = frontend(np.asarray(wav) / config.max_wav_value)
    mel = np.asarray(mel).astype(np.float32)[:, :total]
    energy = np.asarray(energy).astype(np.float32)[:total]
    if mel.shape[1] >= config.max_seq_len:
        return None

    ds = config.dataset
    np.save(os.path.join(out_dir, "alignment", f"{ds}-ali-{basename}.npy"),
            np.asarray(duration), allow_pickle=False)
    np.save(os.path.join(out_dir, "f0", f"{ds}-f0-{basename}.npy"), f0,
            allow_pickle=False)
    np.save(os.path.join(out_dir, "f0_norm", f"{ds}-f0-{basename}.npy"),
            f0_normalization_np(f0), allow_pickle=False)
    np.save(os.path.join(out_dir, "energy", f"{ds}-energy-{basename}.npy"),
            energy, allow_pickle=False)
    np.save(os.path.join(out_dir, "energy_0to1", f"{ds}-energy-{basename}.npy"),
            energy_rescaling_np(energy, config.energy_min, config.energy_max),
            allow_pickle=False)
    np.save(os.path.join(out_dir, "mel_clean", f"{ds}-mel-{basename}.npy"),
            mel.T, allow_pickle=False)

    voiced = [f for f in f0 if f != 0]
    f0_min = min(voiced) if voiced else 0.0
    return (
        "|".join([basename, text]),
        float(max(f0)) if len(f0) else 0.0,
        float(f0_min),
        float(max(energy)) if len(energy) else 0.0,
        float(min(energy)) if len(energy) else 0.0,
        mel.shape[1],
    )


def get_unaligned_wavs(out_dir: str) -> List[str]:
    """Parse MFA bookkeeping files (reference vctk.py:42-53)."""
    unaligned: List[str] = []
    err_path = os.path.join(out_dir, "output_errors.txt")
    if os.path.isfile(err_path):
        with open(err_path, encoding="utf-8") as f:
            blocks = f.read().split(":\nTraceback")
            unaligned += [b.split("\n")[-1] for b in blocks if "CB" in b]
    una_path = os.path.join(out_dir, "unaligned.txt")
    if os.path.isfile(una_path):
        with open(una_path, encoding="utf-8") as f:
            for line in f:
                unaligned.append(line.strip().split(" ")[0].split("\t")[0])
    return unaligned


def build_from_path(in_dir: str, out_dir: str, config: Config,
                    f0_backend: str = None):
    """Full VCTK build (reference vctk.py:56-165)."""
    random.seed(9420)
    ensure_dirs(out_dir)
    frontend = MelFrontend(config)
    embedder = SpeakerEmbedder(config)

    train: List[str] = []
    val: List[str] = []
    f0_max = energy_max = 0.0
    f0_min = energy_min = 1e6
    n_frames = 0
    max_text_len = 0
    max_mel_len = 0

    spkers = sorted(os.listdir(in_dir))
    print(f"Total Speakers : {len(spkers)}")
    unaligned = set(get_unaligned_wavs(out_dir))
    dirty: List[str] = []
    errors: List[str] = []

    spk_dir = os.path.join(out_dir, "spker_embed")
    if len(os.listdir(spk_dir)) != len(spkers):
        print("Speaker embedding...")
        for spker in spkers:
            embs = []
            for dirpath, _, filenames in os.walk(os.path.join(in_dir, spker)):
                for f in filenames:
                    if f.endswith(".wav") and f[:-4] not in unaligned:
                        from styler_tpu.data.audio_io import read_wav

                        audio, _ = read_wav(os.path.join(dirpath, f))
                        embs.append(embedder.embed_wav(audio))
            if embs:
                np.save(
                    os.path.join(spk_dir, f"{config.dataset}-spker_embed-{spker}.npy"),
                    np.mean(embs, axis=0),
                    allow_pickle=False,
                )

    print("Process utterances...")
    for spker in spkers:
        file_paths = []
        for dirpath, _, filenames in os.walk(os.path.join(in_dir, spker)):
            for f in filenames:
                if f.endswith(".txt") and f[:-4] not in unaligned:
                    file_paths.append((Path(dirpath).relative_to(in_dir), f))
        random.shuffle(file_paths)
        # Stage a chunk of utterances, run the multithreaded native f0
        # tracker over the whole chunk (one host thread per utterance —
        # the preprocessing-throughput path, dsp/pitch.py:track_f0_batch),
        # then finish each utterance with its precomputed track.
        CHUNK = 16
        staged = []  # (i, subdir, basename, loaded)
        for i, (subdir, filename) in enumerate(file_paths):
            basename = filename[:-4]
            try:
                loaded = load_aligned(in_dir, out_dir, subdir, basename, config)
            except Exception:
                errors.append(basename)
                continue
            if loaded is None:
                dirty.append(basename)
                continue
            staged.append((i, subdir, basename, loaded))

        for c0 in range(0, len(staged), CHUNK):
            chunk = staged[c0: c0 + CHUNK]
            mels = [None] * len(chunk)
            try:
                if f0_backend == "device":
                    # fused on-device front end: mel + energy + f0 for
                    # the whole chunk in ONE program over ONE (int16)
                    # wav upload (dsp/preprocess.py) — host<->device
                    # transfer is the preprocessing bottleneck
                    from styler_tpu.dsp.preprocess import preprocess_batch

                    outs = preprocess_batch(
                        config, [ld[0] for (_, _, _, ld) in chunk],
                        frontend=frontend,
                    )
                    f0s = [o[2] for o in outs]
                    mels = [(o[0], o[1]) for o in outs]
                else:
                    f0s = track_f0_batch(
                        [ld[0] for (_, _, _, ld) in chunk],
                        config.sampling_rate,
                        config.hop_length,
                        config.f0_min,
                        config.f0_max,
                        backend=f0_backend,
                    )
            except Exception:
                # One bad utterance (e.g. a wav shorter than the
                # tracker's lag window) must not kill the corpus build:
                # fall back to per-utterance tracking so only the bad
                # one lands in errors[] (pre-chunking semantics).
                f0s = []
                mels = [None] * len(chunk)
                for (_, _, basename, loaded) in chunk:
                    try:
                        f0s.append(
                            track_f0_batch(
                                [loaded[0]],
                                config.sampling_rate,
                                config.hop_length,
                                config.f0_min,
                                config.f0_max,
                                backend=f0_backend,
                            )[0]
                        )
                    except Exception:
                        f0s.append(None)
            for (i, subdir, basename, loaded), f0, me in zip(
                chunk, f0s, mels
            ):
                if f0 is None:
                    errors.append(basename)
                    continue
                try:
                    ret = process_utterance(
                        in_dir, out_dir, subdir, basename, config, frontend,
                        loaded=loaded, f0=f0, mel_energy=me,
                    )
                except Exception:
                    errors.append(basename)
                    continue
                if ret is None:
                    dirty.append(basename)
                    continue
                info, f_max, f_min, e_max, e_min, n = ret
                (val if i == 0 else train).append(info)
                f0_max = max(f0_max, f_max)
                f0_min = min(f0_min, f_min) if f_min > 0 else f0_min
                energy_max = max(energy_max, e_max)
                energy_min = min(energy_min, e_min)
                n_frames += n
                max_text_len = max(max_text_len, len(info.split("|")[-1]))
                max_mel_len = max(max_mel_len, n)

    stats = [
        f"Total files: {len(train) + len(val)}",
        f"Total time: {n_frames * config.hop_length / config.sampling_rate / 3600} hours",
        f"Total frames: {n_frames}",
        f"Min F0: {f0_min}",
        f"Max F0: {f0_max}",
        f"Min energy: {energy_min}",
        f"Max energy: {energy_max}",
        f"Max text len: {max_text_len}",
        f"Max mel len: {max_mel_len}",
        f"Total unaligned wavs: {len(unaligned)}",
        f"Total dirty wavs: {len(dirty)}",
        f"Total error wavs: {len(errors)}",
    ]
    with open(os.path.join(out_dir, "stat.txt"), "w", encoding="utf-8") as f:
        for s in stats:
            print(s)
            f.write(s + "\n")

    for data, name in ((dirty, "dirty"), (errors, "error")):
        with open(os.path.join(out_dir, f"{name}.txt"), "w", encoding="utf-8") as f:
            for d in data:
                f.write(d + "\n")

    return train, val


def write_metadata(train: List[str], val: List[str], out_dir: str) -> None:
    with open(os.path.join(out_dir, "train.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(train) + ("\n" if train else ""))
    with open(os.path.join(out_dir, "val.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(val) + ("\n" if val else ""))
