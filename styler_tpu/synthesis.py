"""Synthesis engine: text + reference audio → waveform, fully on-device.

Functional re-expression of the reference CLI paths (synthesize.py):
- ``synthesize``: per-sentence forward with predicted durations
  (synthesize.py:344-385),
- ``inspect``: style-factor ablation grid (infer_inspection, 282-341),
- ``mix_and_match``: the 2^5 controllability combinations built from two
  references' explicit encodings (infer_controllability, 208-279) — here
  the encodings are pure function outputs, not cached module attributes.

The whole text→mel→waveform path is one jitted program per shape bucket;
the reference crosses host/device per stage (stft .cuda() round trips,
separate TF session for the embedder).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from styler_tpu.core.config import Config, bucket_for
from styler_tpu.dsp.features import energy_rescaling_np, f0_normalization_np
from styler_tpu.dsp.mel import MelFrontend
from styler_tpu.dsp.pitch import get_f0, get_f0_noisy
from styler_tpu.models import STYLER
from styler_tpu.textproc import G2p, text_to_sequence, to_phoneme_string
from styler_tpu.vocoder import make_generator
from styler_tpu.vocoder.hifigan import (
    generator_apply_fused,
    generator_fused_supported,
)

_log = logging.getLogger("styler_tpu.synthesis")


@dataclasses.dataclass
class ReferenceFeatures:
    """Frame-domain features of a style reference audio."""

    mel: np.ndarray  # [M, 80]
    f0_norm: np.ndarray  # [M]
    energy01: np.ndarray  # [M]
    mel_len: int


def extract_reference_features(
    wav: np.ndarray,
    config: Config,
    frontend: MelFrontend,
    duration: Optional[list] = None,
    noisy: bool = False,
) -> ReferenceFeatures:
    """Reference wav (int16-scaled float) -> model inputs
    (reference dataset.py:58-71 + synthesize.py:420-441)."""
    f0 = (get_f0_noisy if noisy else get_f0)(wav, config, duration)
    mel, energy = frontend(np.asarray(wav, dtype=np.float32) / config.max_wav_value)
    total = sum(duration) if duration is not None else np.asarray(mel).shape[1]
    mel = np.asarray(mel).astype(np.float32)[:, :total].T
    energy = np.asarray(energy).astype(np.float32)[:total]
    n = min(len(f0), mel.shape[0], len(energy))
    # Long references are trimmed to the largest mel bucket instead of
    # crashing downstream in the bucketed packers — matching the
    # reference's own length policy (it drops >=1000-frame mels at
    # preprocess time, reference data/vctk.py:198-199).
    cap = config.mel_buckets[-1]
    if n > cap:
        _log.warning(
            "reference audio is %d mel frames; trimming to the largest "
            "mel bucket (%d frames, %.1f s) for style extraction",
            n, cap, cap * config.hop_length / config.sampling_rate,
        )
        n = cap
    return ReferenceFeatures(
        mel=mel[:n],
        f0_norm=f0_normalization_np(f0[:n]).astype(np.float32),
        energy01=energy_rescaling_np(
            energy[:n], config.energy_min, config.energy_max
        ).astype(np.float32),
        mel_len=n,
    )


class Synthesizer:
    def __init__(
        self,
        config: Config,
        params,
        batch_stats,
        vocoder_params=None,
    ):
        self.config = config
        self.model = STYLER(config)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.frontend = MelFrontend(config)
        self.g2p = G2p()
        self.generator = make_generator(config.vocoder)
        if vocoder_params is None:
            self.vocoder_variables = jax.jit(self.generator.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, config.n_mel_channels))
            )
        else:
            self.vocoder_variables = {"params": vocoder_params}
        # HiFi-GAN / iSTFTNet inference runs the fused Pallas resblock
        # path (generator_apply_fused / istft_apply_fused) whenever the
        # static mel length supports it; opt out with
        # STYLER_TPU_FUSED_VOCODER=0.
        self._fused_vocoder = (
            config.vocoder in ("HiFi-GAN", "iSTFTNet")
            and os.environ.get("STYLER_TPU_FUSED_VOCODER", "1") != "0"
            and jax.default_backend() == "tpu"
        )
        # Opt-in int8 MXU resblock matmuls (HiFi-GAN fused path only;
        # approximate — measured quality/speed bounds in
        # tools/int8_vocoder_experiment.py).
        self._int8_vocoder = (
            os.environ.get("STYLER_TPU_INT8_VOCODER", "0") == "1"
        )

    def _will_fuse(self, mel_frames: int) -> bool:
        """Trace-time: will _vocode take the fused Pallas path?"""
        return self._fused_vocoder and generator_fused_supported(
            mel_frames, self.generator.config
        )

    def _vocode(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, 80] -> wav [B, T*hop]. Dispatches on the static mel
        length (called under jit, so this Python branch is trace-time)."""
        if self._will_fuse(mel.shape[1]):
            if self.config.vocoder == "iSTFTNet":
                from styler_tpu.vocoder.istft_net import istft_apply_fused

                return istft_apply_fused(
                    self.vocoder_variables,
                    mel,
                    self.generator.config,
                    compute_dtype=self.generator.compute_dtype,
                )
            return generator_apply_fused(
                self.vocoder_variables,
                mel,
                self.generator.config,
                compute_dtype=self.generator.compute_dtype,
                quantize=self._int8_vocoder,
            )
        return self.generator.apply(self.vocoder_variables, mel)

    # ------------------------------------------------------------------

    def text_to_ids(self, sentence: str) -> np.ndarray:
        return self._ids_from_phonemes(to_phoneme_string(sentence, self.g2p))

    def _ids_from_phonemes(self, phoneme_str: str) -> np.ndarray:
        return np.asarray(
            text_to_sequence(phoneme_str, list(self.config.text_cleaners)),
            dtype=np.int32,
        )

    # ------------------------------------------------------------------
    # Long-input handling: inputs past the largest shape bucket are
    # clamped (batch paths) or chunked (single-sentence path) instead of
    # crashing in the bucketed packers. The reference's contract is 1000
    # phonemes / 1024 frames (transformer/Models.py:69-71, hparams.py:58).
    # ------------------------------------------------------------------

    def _clamp_ids(self, ids: np.ndarray) -> np.ndarray:
        cap = self.config.src_buckets[-1]
        if len(ids) > cap:
            _log.warning(
                "sentence has %d phonemes > largest src bucket %d; "
                "truncating (use Synthesizer.synthesize for automatic "
                "chunking of long sentences)", len(ids), cap,
            )
            return ids[:cap]
        return ids

    def _clamp_ref(self, ref: ReferenceFeatures) -> ReferenceFeatures:
        cap = self.config.mel_buckets[-1]
        if ref.mel_len <= cap:
            return ref
        _log.warning(
            "reference has %d mel frames > largest mel bucket %d; trimming",
            ref.mel_len, cap,
        )
        return ReferenceFeatures(
            mel=ref.mel[:cap], f0_norm=ref.f0_norm[:cap],
            energy01=ref.energy01[:cap], mel_len=cap,
        )

    def _phoneme_chunks(self, phoneme_str: str) -> List[np.ndarray]:
        """Split a long sentence's (already-computed) phoneme string into
        per-chunk phoneme-id rows, each fitting the largest src bucket,
        cutting at `sp` (punctuation / pause) tokens when one is
        available (ids are 1:1 with phoneme tokens, so the split is
        exact)."""
        cap = self.config.src_buckets[-1]
        tokens = phoneme_str[1:-1].split(" ")
        chunks, start = [], 0
        while start < len(tokens):
            end = min(start + cap, len(tokens))
            if end < len(tokens):
                # prefer the last pause inside the window (keep it in
                # this chunk so prosody pauses stay attached)
                for j in range(end - 1, start, -1):
                    if tokens[j] == "sp":
                        end = j + 1
                        break
            chunk = "{" + " ".join(tokens[start:end]) + "}"
            chunks.append(
                np.asarray(
                    text_to_sequence(chunk, list(self.config.text_cleaners)),
                    dtype=np.int32,
                )
            )
            start = end
        return chunks

    def _synthesize_long(
        self, phoneme_str, ref, speaker_embed, d_control, p_control, e_control
    ) -> Dict:
        """Chunked synthesis for sentences past the largest src bucket:
        one batched forward over the chunks, outputs concatenated in
        order. The reference handles up to 1000 phonemes in one forward
        (transformer/Models.py:69-71); the static-shape equivalent is
        chunking — each chunk's mel is also bounded by the largest mel
        bucket, which a single 1000-phoneme forward would overflow.
        The chunk batch pads to the next power of two so the compiled
        batch sizes stay bounded and `warmup(batches=...)` can cover
        them (otherwise every distinct chunk count would compile a
        fresh program at request time)."""
        ids_rows = self._phoneme_chunks(phoneme_str)
        k = len(ids_rows)
        _log.warning(
            "sentence exceeds the largest src bucket (%d phonemes); "
            "synthesizing as %d chunks and concatenating",
            self.config.src_buckets[-1], k,
        )
        B = 1 << (k - 1).bit_length()
        ids_rows = ids_rows + [ids_rows[0][:1]] * (B - k)
        parts = self.synthesize_batch(
            [None] * B,
            [ref] * B,
            [speaker_embed] * B,
            d_control=d_control, p_control=p_control, e_control=e_control,
            ids_rows=ids_rows,
        )[:k]
        cat = lambda key: np.concatenate([p[key] for p in parts], axis=0)
        return {
            "mel": cat("mel"),
            "mel_noisy": cat("mel_noisy"),
            "wav": cat("wav"),
            "wav_noisy": cat("wav_noisy"),
            "f0": cat("f0"),
            "energy": cat("energy"),
            "mel_len": int(sum(p["mel_len"] for p in parts)),
            "chunks": k,
        }

    @functools.partial(jax.jit, static_argnames=("self", "max_mel_len"))
    def _encode(
        self,
        src_seq,
        src_len,
        mel,
        f0_norm,
        energy01,
        mel_len,
        speaker_embed,
        d_control,
        p_control,
        e_control,
        max_mel_len,
    ):
        """Style-modeling forward only (no decode/postnet/vocoder) — the
        encodings producer for mix_and_match/inspect, which discard the
        base mels. Returns (encodings, src_mask, predicted mel_len)."""
        return self.model.apply(
            self.variables,
            src_seq=src_seq,
            mel_target=mel,
            mel_aug=mel,
            p_norm=f0_norm,
            e_input=energy01,
            src_len=src_len,
            mel_len=mel_len,
            max_src_len=src_seq.shape[1],
            max_mel_len=max_mel_len,
            speaker_embed=speaker_embed,
            d_control=d_control,
            p_control=p_control,
            e_control=e_control,
            method="encode_style",
        )

    @functools.partial(jax.jit, static_argnames=("self", "max_mel_len"))
    def _forward(
        self,
        src_seq,
        src_len,
        mel,
        f0_norm,
        energy01,
        mel_len,
        speaker_embed,
        d_control,
        p_control,
        e_control,
        max_mel_len,
    ):
        out = self.model.apply(
            self.variables,
            src_seq=src_seq,
            mel_target=mel,
            mel_aug=mel,
            p_norm=f0_norm,
            e_input=energy01,
            src_len=src_len,
            mel_len=mel_len,
            max_src_len=src_seq.shape[1],
            max_mel_len=max_mel_len,
            speaker_embed=speaker_embed,
            d_control=d_control,
            p_control=p_control,
            e_control=e_control,
        )
        # One 2B vocoder pass for clean+noisy: ~28% faster than two B
        # passes on the fused Pallas path (per-call fixed cost amortizes;
        # batch is just grid rows, activations stay in VMEM). The XLA
        # conv path keeps two passes — its HBM intermediates scale with
        # batch (2x16x1024 frames would need ~22 GB on a 16 GB v5e).
        if self._will_fuse(out.mel_postnet.shape[1]):
            B = out.mel_postnet.shape[0]
            wavs = self._vocode(
                jnp.concatenate(
                    [out.mel_postnet, out.mel_postnet_noisy], axis=0
                )
            )
            return out, wavs[:B], wavs[B:]
        wav_clean = self._vocode(out.mel_postnet)
        wav_noisy = self._vocode(out.mel_postnet_noisy)
        return out, wav_clean, wav_noisy

    def warmup(self, batches=(1,)) -> int:
        """Precompile the serving forward for EVERY (batch, src bucket,
        mel bucket) triple so no real request ever pays a compile (the
        persistent XLA cache makes this mostly cache loads after the
        first run). Returns the number of programs warmed."""
        cfg = self.config
        n = 0
        for B in batches:
            for L in cfg.src_buckets:
                for M in cfg.mel_buckets:
                    out, wav, _ = self._forward(
                        jnp.zeros((B, L), jnp.int32),
                        jnp.ones((B,), jnp.int32),
                        jnp.zeros((B, M, cfg.n_mel_channels), jnp.float32),
                        jnp.zeros((B, M), jnp.float32),
                        jnp.zeros((B, M), jnp.float32),
                        jnp.ones((B,), jnp.int32),
                        jnp.zeros((B, cfg.speaker_embed_dim), jnp.float32),
                        1.0, 1.0, 1.0,
                        cfg.mel_buckets[-1],
                    )
                    # a real host fetch, not block_until_ready: on the
                    # axon platform block_until_ready returns before the
                    # computation runs (CLAUDE.md) — without the fetch
                    # the "warmed" program would compile lazily on the
                    # first REAL request instead
                    float(wav[0, 0])
                    n += 1
        # the reference front end compiles per wav-length bucket too —
        # warm the common ones so a fresh reference doesn't pay it
        for F in (256, 1024):
            self.frontend(
                np.zeros((F - 1) * cfg.hop_length, np.float32)
            )
        return n

    def synthesize(
        self,
        sentence: str,
        ref: ReferenceFeatures,
        speaker_embed: np.ndarray,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ) -> Dict:
        """One sentence with one reference → mels + waveforms + predictions.

        Sentences past the largest src bucket are synthesized in chunks
        (cut at pauses) and concatenated — the chunked result has no
        ``encodings``/``src_mask``/``duration`` keys and adds ``chunks``.
        """
        cfg = self.config
        ref = self._clamp_ref(ref)
        phoneme_str = to_phoneme_string(sentence, self.g2p)
        ids = self._ids_from_phonemes(phoneme_str)
        if len(ids) > cfg.src_buckets[-1]:
            return self._synthesize_long(
                phoneme_str, ref, speaker_embed, d_control, p_control,
                e_control,
            )
        L = bucket_for(len(ids), cfg.src_buckets)
        M_in = bucket_for(ref.mel_len, cfg.mel_buckets)
        M_out = cfg.mel_buckets[-1]

        src_seq = np.zeros((1, L), np.int32)
        src_seq[0, : len(ids)] = ids
        mel = np.zeros((1, M_in, cfg.n_mel_channels), np.float32)
        mel[0, : ref.mel_len] = ref.mel[: ref.mel_len]
        f0 = np.zeros((1, M_in), np.float32)
        f0[0, : ref.mel_len] = ref.f0_norm[: ref.mel_len]
        en = np.zeros((1, M_in), np.float32)
        en[0, : ref.mel_len] = ref.energy01[: ref.mel_len]

        out, wav_clean, wav_noisy = self._forward(
            jnp.asarray(src_seq),
            jnp.asarray([len(ids)], dtype=jnp.int32),
            jnp.asarray(mel),
            jnp.asarray(f0),
            jnp.asarray(en),
            jnp.asarray([ref.mel_len], dtype=jnp.int32),
            jnp.asarray(speaker_embed.reshape(1, -1)),
            float(d_control),
            float(p_control),
            float(e_control),
            M_out,
        )
        mel_len = int(out.mel_len[0])
        n_samples = mel_len * cfg.hop_length
        return {
            "mel": np.asarray(out.mel_postnet)[0, :mel_len],
            "mel_noisy": np.asarray(out.mel_postnet_noisy)[0, :mel_len],
            "wav": np.asarray(wav_clean)[0, :n_samples],
            "wav_noisy": np.asarray(wav_noisy)[0, :n_samples],
            "f0": np.asarray(out.p_prediction)[0, :mel_len],
            "energy": np.asarray(out.e_prediction)[0, :mel_len],
            "duration": np.asarray(out.log_d_prediction)[0],
            "mel_len": mel_len,
            "encodings": out.encodings,
            "src_mask": np.asarray(out.src_mask),
        }

    def synthesize_batch(
        self,
        sentences: list,
        refs: list,
        speaker_embeds: list,
        mesh=None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
        ids_rows: Optional[list] = None,
    ) -> list:
        """Batched synthesis: N (sentence, reference) pairs in ONE jitted
        forward (+ optional SPMD sharding of the batch axis over a
        ``jax.sharding.Mesh`` — the serving-scale path; the reference
        loops sentences one by one, synthesize.py:449-453).

        Returns a list of per-item dicts like ``synthesize``'s (without
        encodings). The batch is padded up to a multiple of the mesh's
        data-axis size when a mesh is given. ``ids_rows`` bypasses
        text→phoneme conversion with precomputed id rows (the chunked
        long-sentence path). Over-long rows are truncated with a warning.
        """
        cfg = self.config
        n = len(sentences)
        assert len(refs) == n and len(speaker_embeds) == n
        ids = ids_rows if ids_rows is not None else [
            self.text_to_ids(s) for s in sentences
        ]
        truncated = [
            len(i) > cfg.src_buckets[-1] or r.mel_len > cfg.mel_buckets[-1]
            for i, r in zip(ids, refs)
        ]
        ids = [self._clamp_ids(i) for i in ids]
        refs = [self._clamp_ref(r) for r in refs]
        L = bucket_for(max(len(i) for i in ids), cfg.src_buckets)
        M_in = bucket_for(max(r.mel_len for r in refs), cfg.mel_buckets)
        M_out = cfg.mel_buckets[-1]

        B = n
        if mesh is not None:
            data_axis = mesh.shape[cfg.mesh_data_axis]
            B = ((n + data_axis - 1) // data_axis) * data_axis

        src_seq = np.zeros((B, L), np.int32)
        src_len = np.ones(B, np.int32)
        mel = np.zeros((B, M_in, cfg.n_mel_channels), np.float32)
        f0 = np.zeros((B, M_in), np.float32)
        en = np.zeros((B, M_in), np.float32)
        mel_len = np.ones(B, np.int32)
        spk = np.zeros((B, len(np.ravel(speaker_embeds[0]))), np.float32)
        for i in range(n):
            src_seq[i, : len(ids[i])] = ids[i]
            src_len[i] = len(ids[i])
            r = refs[i]
            mel[i, : r.mel_len] = r.mel[: r.mel_len]
            f0[i, : r.mel_len] = r.f0_norm[: r.mel_len]
            en[i, : r.mel_len] = r.energy01[: r.mel_len]
            mel_len[i] = r.mel_len
        for i in range(B):
            spk[i] = np.ravel(speaker_embeds[min(i, n - 1)])

        arrays = (
            jnp.asarray(src_seq), jnp.asarray(src_len), jnp.asarray(mel),
            jnp.asarray(f0), jnp.asarray(en), jnp.asarray(mel_len),
            jnp.asarray(spk),
        )
        if mesh is not None:
            from styler_tpu.parallel import batch_sharding

            sh = batch_sharding(mesh, cfg)
            arrays = tuple(jax.device_put(a, sh) for a in arrays)

        out, wav_clean, wav_noisy = self._forward(
            *arrays[:2], *arrays[2:],
            float(d_control), float(p_control), float(e_control), M_out,
        )
        results = []
        for i in range(n):
            ml = int(out.mel_len[i])
            ns = ml * cfg.hop_length
            results.append(
                {
                    "mel": np.asarray(out.mel_postnet)[i, :ml],
                    "mel_noisy": np.asarray(out.mel_postnet_noisy)[i, :ml],
                    "wav": np.asarray(wav_clean)[i, :ns],
                    "wav_noisy": np.asarray(wav_noisy)[i, :ns],
                    "f0": np.asarray(out.p_prediction)[i, :ml],
                    "energy": np.asarray(out.e_prediction)[i, :ml],
                    "mel_len": ml,
                    # surfaced in serve replies: the batch path clamps
                    # over-long inputs rather than chunking (the
                    # single-sentence path chunks instead)
                    "truncated": truncated[i],
                }
            )
        return results

    # ------------------------------------------------------------------
    # Mixed-encoding decode (shared by inspect / mix_and_match)
    # ------------------------------------------------------------------

    def _mix_core(self, t, p, e, d, s, n, src_mask, spk_w, noise_w, max_mel_len):
        """Traced hot path over B pre-mixed combos: predict_inference +
        decode + vocoder in ONE program (the reference re-runs the full
        CLI per combo, synthesize.py:208-279; round-1 ran one dispatch
        per combo — ~40 ms tunnel overhead each — now one total).

        spk_w / noise_w: per-item float weights [B]; spk_w=1 feeds
        speaker into the pitch predictor (speaker_normalized=False),
        noise_w=1 adds the frame-domain noise stream to the decode.
        """
        pieces = self.model.apply(
            self.variables,
            t, p, e, d, s, n,
            src_mask,
            max_mel_len,
            spk_w,
            method=lambda m, *a: m.style_modeling.predict_inference(*a),
        )
        text_f, pitch_emb, speaker_f, energy_emb, noise_f, log_d, p_pred, e_pred, mel_mask = pieces
        style_out = (
            text_f + pitch_emb + speaker_f + energy_emb
            + jnp.asarray(noise_w, noise_f.dtype)[:, None, None] * noise_f
        )
        _, mel_postnet = self.model.apply(
            self.variables, style_out, mel_mask, method="decode"
        )
        B = mel_postnet.shape[0]
        if self._will_fuse(mel_postnet.shape[1]) or B <= 4:
            # fused Pallas path: batch is just grid rows, activations
            # stay in VMEM — one call for all combos
            wav = self._vocode(mel_postnet)
        else:
            # unfused XLA conv path: HBM intermediates scale with batch
            # (32x1024 frames would be tens of GB) — chunk via lax.map
            c = 4
            while B % c:
                c -= 1
            wav = jax.lax.map(
                self._vocode, mel_postnet.reshape(B // c, c, *mel_postnet.shape[1:])
            ).reshape(B, -1)
        return mel_postnet, wav, p_pred, e_pred, mel_mask

    def _compress(self, mel_postnet, wav, p_pred, e_pred, n):
        """Trim to n frames + fetch compression (traced). The combo
        fetch over the tunnel dominates mix_and_match wall time (432 of
        436 ms at ~11 MB f32; raw tunnel profile ~30 ms/fetch + ~36 MB/s,
        tools/mix_breakdown.py 2026-08-19), so the wav goes over as
        int16 — exactly the quantization audiowrite applies when writing
        the file (data/audio_io.py:58) — and the plot/npy features as
        f16 (<=5e-4 relative error on log-mel), halving the bytes."""
        wav_i16 = jnp.round(
            jnp.clip(wav[:, : n * self.config.hop_length], -1.0, 1.0) * 32767.0
        ).astype(jnp.int16)
        return (
            mel_postnet[:, :n].astype(jnp.float16),
            wav_i16,
            p_pred[:, :n].astype(jnp.float16),
            e_pred[:, :n].astype(jnp.float16),
        )

    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _trim_jit(self, mel_postnet, wav, p_pred, e_pred, n):
        return self._compress(mel_postnet, wav, p_pred, e_pred, n)

    def _unpack_results(self, titles, mel_postnet, wav, p_pred, e_pred, mel_lens):
        """Fetched compressed outputs [B, ...] -> per-combo host dicts
        (one device_get for everything)."""
        mel_postnet, wav, p_pred, e_pred, mel_lens = jax.device_get(
            (mel_postnet, wav, p_pred, e_pred, mel_lens)
        )
        mel_postnet = mel_postnet.astype(np.float32)
        wav = wav.astype(np.float32) / 32767.0
        p_pred = p_pred.astype(np.float32)
        e_pred = e_pred.astype(np.float32)
        out = {}
        for i, title in enumerate(titles):
            ml = int(mel_lens[i])
            out[title] = {
                "mel": mel_postnet[i, :ml],
                "wav": wav[i, : ml * self.config.hop_length],
                "f0": p_pred[i, :ml],
                "energy": e_pred[i, :ml],
                "mel_len": ml,
            }
        return out

    def _mix_results(self, titles, mel_postnet, wav, p_pred, e_pred, mel_mask):
        """Uncompressed device outputs [B, ...] -> per-combo host dicts:
        fetch the mask, pick the smallest trim bucket, compress, fetch
        (the inspect path — its decode bucket is the max but rows are
        usually shorter, so the mask round-trip pays for itself)."""
        mel_lens = (~np.asarray(mel_mask)).sum(-1)
        n = bucket_for(int(mel_lens.max()), self.config.mel_buckets)
        return self._unpack_results(
            titles,
            *self._trim_jit(mel_postnet, wav, p_pred, e_pred, n),
            mel_lens,
        )

    def _pitch_up(self, x):
        return self.model.apply(
            self.variables, x, method=lambda m, v: m.style_modeling.pitch_linear(v)
        )

    def _pack_rows(self, ids_rows, ref_rows, spk_rows):
        """Pad parallel (token ids, ReferenceFeatures, speaker embed)
        rows into the bucketed [B, L]/[B, M_in] device arrays the
        encode/forward programs take."""
        cfg = self.config
        ids_rows = [self._clamp_ids(i) for i in ids_rows]
        ref_rows = [self._clamp_ref(r) for r in ref_rows]
        B = len(ids_rows)
        L = bucket_for(max(len(i) for i in ids_rows), cfg.src_buckets)
        M_in = bucket_for(max(r.mel_len for r in ref_rows), cfg.mel_buckets)
        src_seq = np.zeros((B, L), np.int32)
        src_len = np.ones(B, np.int32)
        mel = np.zeros((B, M_in, cfg.n_mel_channels), np.float32)
        f0 = np.zeros((B, M_in), np.float32)
        en = np.zeros((B, M_in), np.float32)
        mel_len = np.ones(B, np.int32)
        spk = np.zeros((B, len(np.ravel(spk_rows[0]))), np.float32)
        for i, (ids, r, s) in enumerate(zip(ids_rows, ref_rows, spk_rows)):
            src_seq[i, : len(ids)] = ids
            src_len[i] = len(ids)
            mel[i, : r.mel_len] = r.mel[: r.mel_len]
            f0[i, : r.mel_len] = r.f0_norm[: r.mel_len]
            en[i, : r.mel_len] = r.energy01[: r.mel_len]
            mel_len[i] = r.mel_len
            spk[i] = np.ravel(s)
        return tuple(
            jnp.asarray(a) for a in (src_seq, src_len, mel, f0, en, mel_len, spk)
        )

    # ------------------------------------------------------------------
    # Inspection: style-factor ablations (reference synthesize.py:282-341)
    # ------------------------------------------------------------------

    # (title, pitch source: "sp"|"norm"|None, +energy, +duration,
    #  speaker->pitch weight, noise weight); order = reference
    # infer_inspection's title order (synthesize.py:282-341)
    _INSPECT_COMBOS = (
        ("T+D+P+E+S+N", "sp", 1, 1, 1.0, 1.0),
        ("T+D+P+E+N", "norm", 1, 1, 0.0, 1.0),
        ("T+D+P+N", "norm", 0, 1, 0.0, 1.0),
        ("T+D+N", None, 0, 1, 0.0, 1.0),
        ("T+N", None, 0, 0, 0.0, 1.0),
        ("T", None, 0, 0, 0.0, 0.0),
        ("T+D", None, 0, 1, 0.0, 0.0),
        ("T+D+P", "norm", 0, 1, 0.0, 0.0),
        ("T+D+P+E", "norm", 1, 1, 0.0, 0.0),
        ("T+D+P+E+S", "sp", 1, 1, 1.0, 0.0),
    )

    @functools.partial(jax.jit, static_argnames=("self", "max_mel_len"))
    def _inspect_jit(
        self, t, t_neck, d, s, e, n, p_down, s_down, src_mask, max_mel_len
    ):
        """Pack the 10 ablation rows + run the mixed decode, all in one
        jitted program ([1, L, 256] inputs -> [10, ...] outputs)."""
        p_sp = self._pitch_up(p_down + s_down)
        p_no = self._pitch_up(p_down)
        rows_p, rows_e, rows_d, spk_w, noise_w = [], [], [], [], []
        for (_, psrc, add_e, add_d, sw, nw) in self._INSPECT_COMBOS:
            pp = {"sp": t_neck + p_sp, "norm": t_neck + p_no, None: t_neck}[psrc]
            rows_p.append(pp)
            rows_e.append(t_neck + e if add_e else t_neck)
            rows_d.append(t_neck + d if add_d else t_neck)
            spk_w.append(sw)
            noise_w.append(nw)
        B = len(self._INSPECT_COMBOS)
        tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:])
        return self._mix_core(
            tile(t),
            jnp.concatenate(rows_p, axis=0),
            jnp.concatenate(rows_e, axis=0),
            jnp.concatenate(rows_d, axis=0),
            tile(s),
            tile(n),
            tile(src_mask),
            jnp.asarray(spk_w, jnp.float32),
            jnp.asarray(noise_w, jnp.float32),
            max_mel_len,
        )

    def inspect(self, sentence: str, ref: ReferenceFeatures, speaker_embed) -> Dict[str, Dict]:
        """Ablation grid: T, T+D, T+D+P, ..., T+D+P+E+S+N
        (reference infer_inspection titles) — one base encode (no
        decode: the ablation rows re-decode anyway) + one batched
        10-row decode. The decode bucket stays at the max: the
        duration-ablated rows (T, T+N) predict from t_neck alone, so
        their lengths are not bounded by the base row's."""
        ids = self.text_to_ids(sentence)
        arrays = self._pack_rows([ids], [ref], [speaker_embed])
        enc, src_mask, _ = self._encode(
            *arrays, 1.0, 1.0, 1.0, self.config.mel_buckets[-1]
        )
        outs = self._inspect_jit(
            enc["t"], enc["t_neck"], enc["d"], enc["s"], enc["e"], enc["n"],
            enc["p_down"], enc["s_down"],
            src_mask,
            self.config.mel_buckets[-1],
        )
        return self._mix_results([c[0] for c in self._INSPECT_COMBOS], *outs)

    # ------------------------------------------------------------------
    # Controllability: 2^5 mix-and-match (reference synthesize.py:208-279)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "max_mel_len"))
    def _comb_jit(
        self, t4, t_neck4, n4, d4, p_down4, e4, s4, s_down4, src_mask4, max_mel_len
    ):
        """Gather the 32 combos from the 4 base rows ((text, ref) =
        (0,0),(0,1),(1,0),(1,1)) and run the mixed decode — one program,
        with the fetch compression fused in: every combo's duration
        input equals some base row's, so the trim bucket always equals
        the decode bucket and the inspect path's mask-fetch round trip
        + separate trim dispatch (~70 ms on the tunnel) can be skipped.

        comb "abcde": a selects the text (and noise/masks), b duration,
        c pitch, d energy, e speaker (reference create_enc_comb,
        synthesize.py:239-274)."""
        bits = np.array(
            [[(comb >> (4 - i)) & 1 for i in range(5)] for comb in range(32)]
        )
        a, b, c, d_bit, e_bit = bits.T
        row = lambda r: jnp.asarray(2 * a + r)
        T = jnp.take(t4, row(a), axis=0)
        TN = jnp.take(t_neck4, row(a), axis=0)
        N = jnp.take(n4, row(a), axis=0)
        D = TN + jnp.take(d4, row(b), axis=0)
        E = TN + jnp.take(e4, row(d_bit), axis=0)
        S = jnp.take(s4, row(e_bit), axis=0)
        p_tgt = self._pitch_up(
            jnp.take(p_down4, row(c), axis=0) + jnp.take(s_down4, row(e_bit), axis=0)
        )
        mask = jnp.take(src_mask4, row(a), axis=0)
        ones = jnp.ones(32, jnp.float32)
        mel_postnet, wav, p_pred, e_pred, mel_mask = self._mix_core(
            T, TN + p_tgt, E, D, S, N, mask, ones, 0.0 * ones, max_mel_len
        )
        mel_lens = (~mel_mask).sum(-1)
        return (
            *self._compress(mel_postnet, wav, p_pred, e_pred, max_mel_len),
            mel_lens,
        )

    def mix_and_match(
        self,
        sentence_by_ref: Tuple[str, str],
        refs: Tuple[ReferenceFeatures, ReferenceFeatures],
        speaker_embeds: Tuple[np.ndarray, np.ndarray],
    ) -> Dict[str, Dict]:
        """All 2^5 (text, duration, pitch, energy, speaker) source combos.

        comb "abcde": a selects the text (and with it noise/masks),
        b duration, c pitch, d energy, e speaker — 0=ref1, 1=ref2,
        matching the reference's create_enc_comb (synthesize.py:239-274).

        Two dispatches total: one 4-row base encode (style modeling
        only; no decode — the mixed rows re-decode) + one 32-row mixed
        decode."""
        titles, outs = self._mix_device_outs(
            sentence_by_ref, refs, speaker_embeds
        )
        return self._unpack_results(titles, *outs)

    def _mix_device_outs(
        self,
        sentence_by_ref: Tuple[str, str],
        refs: Tuple[ReferenceFeatures, ReferenceFeatures],
        speaker_embeds: Tuple[np.ndarray, np.ndarray],
    ) -> Tuple[list, tuple]:
        """The mix-and-match compute path without the host fetch of the
        results: returns (titles, device output arrays). Split out so the
        bench can fence the on-device compute separately from the
        host-link transfer (the two are ~55/45 on the tunneled dev box —
        TODO.md #4)."""
        cfg = self.config
        ids = [self.text_to_ids(s) for s in sentence_by_ref]
        # rows (text a, ref r) in order (0,0),(0,1),(1,0),(1,1)
        pairs = ((0, 0), (0, 1), (1, 0), (1, 1))
        arrays = self._pack_rows(
            [ids[ti] for ti, _ in pairs],
            [refs[ri] for _, ri in pairs],
            [speaker_embeds[ri] for _, ri in pairs],
        )
        enc, src_mask, base_mel_len = self._encode(
            *arrays, 1.0, 1.0, 1.0, cfg.mel_buckets[-1]
        )
        # Every combo's duration input (t_neck of text a + d of ref b)
        # is EXACTLY base row 2a+b's, so the max predicted combo length
        # equals the max base mel_len: decode the 32 combos at the
        # smallest bucket that holds it instead of always the largest
        # (2x less decode+vocode work on typical sentence lengths).
        M_comb = bucket_for(int(np.asarray(base_mel_len).max()), cfg.mel_buckets)
        outs = self._comb_jit(
            enc["t"], enc["t_neck"], enc["n"], enc["d"], enc["p_down"],
            enc["e"], enc["s"], enc["s_down"], src_mask, M_comb,
        )
        titles = [f"{comb:05b}" for comb in range(32)]
        return titles, outs


def load_reference(
    config: Config,
    frontend: MelFrontend,
    name: str,
    speaker_id: Optional[str] = None,
    noisy: bool = False,
) -> Tuple[ReferenceFeatures, np.ndarray]:
    """Load a style reference by name: wav from ``config.ref_audio_dir``,
    optional MFA TextGrid trim from ``config.ref_tg_dir``, plus the
    speaker embedding (precomputed npy by speaker id, else embedded
    on-the-fly). Shared by cli/synthesize.py and cli/serve.py
    (reference synthesize.py:420-455 flow)."""
    from styler_tpu.data.audio_io import read_wav_int
    from styler_tpu.data.textgrid import alignment_from_file

    wav_path = os.path.join(config.ref_audio_dir, name + ".wav")
    tg_path = os.path.join(config.ref_tg_dir, name + ".TextGrid")
    sr, wav = read_wav_int(wav_path)
    duration = None
    if os.path.exists(tg_path):
        _, duration, start, end = alignment_from_file(
            tg_path, config.sampling_rate, config.hop_length
        )
        wav = wav[
            int(config.sampling_rate * start) : int(config.sampling_rate * end)
        ]
    ref = extract_reference_features(
        wav.astype(np.float32), config, frontend, duration, noisy
    )
    spk = speaker_id or name.split("_")[0]
    spk_path = os.path.join(
        config.preprocessed_path,
        "spker_embed",
        f"{config.dataset}-spker_embed-{spk}.npy",
    )
    if os.path.exists(spk_path):
        speaker_embed = np.load(spk_path)
    else:
        from styler_tpu.data.vctk import SpeakerEmbedder

        speaker_embed = SpeakerEmbedder(config).embed_wav(
            wav.astype(np.float32) / config.max_wav_value
        )
    return ref, np.asarray(speaker_embed, dtype=np.float32)


#: committed trained generator assets (cli/train_vocoder.py →
#: tools/export_vocoder_asset.py), keyed by config.vocoder arch name
_VOCODER_ASSET_FILES = {"iSTFTNet": "istft_gen.npz", "HiFi-GAN": "hifigan_gen.npz"}


def default_vocoder_asset(arch: str) -> Optional[str]:
    """Path to the committed trained generator for ``arch``, or None."""
    fname = _VOCODER_ASSET_FILES.get(arch)
    if not fname:
        return None
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "vocoder", fname,
    )
    return path if os.path.exists(path) else None


def default_acoustic_asset() -> Optional[str]:
    """Path to the committed trained STYLER acoustic weights
    (tools/export_acoustic_asset.py), or None. The serving analog of the
    reference's published 560k-step checkpoint (README.md:14-15)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "acoustic", "styler_gen.npz",
    )
    return path if os.path.exists(path) else None


def load_synthesizer(
    config: Config,
    ckpt_path: Optional[str] = None,
    vocoder_path: Optional[str] = None,
    vocoder_arch: Optional[str] = None,
) -> Synthesizer:
    """Build a Synthesizer from a reference ``.pth.tar``, an orbax dir, a
    trained ``.npz`` acoustic asset, or fresh random weights.

    Acoustic resolution: an explicit ``ckpt_path`` always wins
    (``.pth.tar`` → reference importer, dir → orbax, ``.npz`` →
    committed-asset format); ``ckpt_path=None`` falls back to the
    committed trained acoustic asset under ``assets/acoustic/`` when one
    exists; ``ckpt_path="random"`` is the explicit random-init escape
    hatch for tests/experiments.

    Vocoder resolution mirrors the reference's contract that serving
    always gets REAL pretrained vocoder weights (reference
    utils.py:250-262 loads the universal HiFi-GAN unconditionally):

    1. explicit ``vocoder_path`` → loaded for ``vocoder_arch`` or
       ``config.vocoder`` (orbax dir / repo ``.npz`` asset / torch
       ``.pth.tar``);
    2. no path → the committed trained asset in ``assets/vocoder/``
       matching the arch. When the caller did not pin an arch
       (``vocoder_arch=None``) and the acoustic weights are NOT a
       reference torch checkpoint, the arch defaults to the trained
       iSTFTNet — both faster (~2x single-sentence e2e) and better on
       held-out mel MAE than the trained HiFi-GAN
       (assets/vocoder/*_eval.json). Reference ``.pth.tar`` checkpoints
       keep HiFi-GAN for parity with the published model.
    3. ``vocoder_path="random"`` → random-init generator weights; the
       explicit escape hatch for tests/experiments (never the default).
    """
    import jax

    from_reference_ckpt = bool(ckpt_path) and ckpt_path.endswith(
        (".pth.tar", ".pth", ".tar")
    )
    if vocoder_arch:
        config = config.replace(vocoder=vocoder_arch)
    elif vocoder_path is None and not from_reference_ckpt:
        # natively-served default: promote the trained iSTFTNet asset
        # when we own one (see docstring, resolution rule 2)
        if default_vocoder_asset("iSTFTNet"):
            config = config.replace(vocoder="iSTFTNet")

    if from_reference_ckpt:
        from styler_tpu.core.checkpoint import load_reference_checkpoint

        params, batch_stats = load_reference_checkpoint(ckpt_path, config)
    elif ckpt_path and ckpt_path != "random" and ckpt_path.endswith(".npz"):
        from styler_tpu.core.checkpoint import load_acoustic_npz

        params, batch_stats = load_acoustic_npz(ckpt_path)
    elif ckpt_path and ckpt_path != "random" and os.path.isdir(ckpt_path):
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
        params, batch_stats = restored["params"], restored["batch_stats"]
    elif ckpt_path is None and default_acoustic_asset():
        # natively-served default: the committed trained acoustic asset,
        # mirroring the vocoder resolution below (the reference never
        # serves untrained weights; README.md:14-15 ships a checkpoint)
        from styler_tpu.core.checkpoint import load_acoustic_npz

        asset = default_acoustic_asset()
        params, batch_stats = load_acoustic_npz(asset)
        _log.info("acoustic: loaded trained asset %s", asset)
    else:
        from __graft_entry__ import _example_batch

        model = STYLER(config)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(config.seed), **_example_batch(config, with_targets=False)
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    vocoder_params = None
    if vocoder_path == "random":
        _log.info("vocoder: random-init %s generator (explicit escape hatch)",
                  config.vocoder)
    elif vocoder_path:
        if not os.path.exists(vocoder_path):
            raise FileNotFoundError(f"vocoder checkpoint: {vocoder_path}")
        if os.path.isdir(vocoder_path):
            # natively-trained generator (cli/train_vocoder.py, orbax dir)
            from styler_tpu.core.checkpoint import load_vocoder_params

            vocoder_params = load_vocoder_params(vocoder_path)
        elif vocoder_path.endswith(".npz"):
            # committed repo asset (tools/export_vocoder_asset.py)
            from styler_tpu.core.checkpoint import load_vocoder_npz

            vocoder_params = load_vocoder_npz(vocoder_path)
        else:
            from styler_tpu.core.checkpoint import load_reference_vocoder

            vocoder_params = load_reference_vocoder(
                vocoder_path, config.vocoder
            )
    else:
        asset = default_vocoder_asset(config.vocoder)
        if asset:
            from styler_tpu.core.checkpoint import load_vocoder_npz

            vocoder_params = load_vocoder_npz(asset)
            _log.info("vocoder: loaded trained %s asset %s",
                      config.vocoder, asset)
        else:
            _log.warning(
                "vocoder: no trained %s asset committed and no "
                "vocoder_path given — using RANDOM-INIT generator "
                "weights (audio will be noise)", config.vocoder,
            )
    return Synthesizer(config, params, batch_stats, vocoder_params)
