"""AOT serving export: serialize the text+reference -> waveform program.

`jax.export` lowers the jitted synthesis forward (STYLER acoustic model
+ vocoder, one program per shape bucket) to versioned StableHLO and
serializes it, so a serving process can run synthesis with *zero* model
-building Python — just JAX runtime + the artifact + a flat weights
blob. Artifacts are portable across processes and (with
``platforms=["cpu","tpu"]``) across backends, and are loadable from
non-Python PJRT runtimes.

The reference has no export/serving story: its serving path re-runs
eager PyTorch per sentence (reference synthesize.py:344-385). This is
the TPU-production equivalent of a torchscript/ONNX export.

Bundle layout (one directory)::

    manifest.json   # shapes, audio params, entry->file map
    weights.npz     # m000..mNNN / v000..vNNN flat leaf arrays
    fwd_b{B}_L{L}_M{M}.jaxexp   # serialized Exported per bucket pair

Weights are passed to the exported program as *flat lists* of arrays
(the pytree structure is baked into the traced program at export time),
so loading never has to reconstruct a framework pytree — an ordered
npz read is enough.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _entry_name(batch: int, src_bucket: int, mel_bucket: int) -> str:
    return f"fwd_b{batch}_L{src_bucket}_M{mel_bucket}"


def make_serving_fn(synth, max_mel_len: int, fused: bool = False):
    """Pure function over flat weight lists: the `Synthesizer._forward`
    program (style encode -> predict -> dual decode -> vocoder, reference
    synthesize.py:344-379 semantics) re-expressed for export.

    ``fused=True`` bakes in the Pallas fused-vocoder path — TPU-only
    artifacts; the default XLA conv path is portable to any platform.
    """
    model = synth.model
    generator = synth.generator
    _, model_def = jax.tree.flatten(synth.variables)
    _, voc_def = jax.tree.flatten(synth.vocoder_variables)

    def vocode(voc_variables, mel):
        if fused:
            if synth.config.vocoder == "iSTFTNet":
                from styler_tpu.vocoder.istft_net import istft_apply_fused

                return istft_apply_fused(
                    voc_variables, mel, generator.config,
                    compute_dtype=generator.compute_dtype,
                )
            from styler_tpu.vocoder.hifigan import generator_apply_fused

            return generator_apply_fused(
                voc_variables, mel, generator.config,
                compute_dtype=generator.compute_dtype,
            )
        return generator.apply(voc_variables, mel)

    def fn(
        model_flat,
        voc_flat,
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
    ):
        variables = jax.tree.unflatten(model_def, list(model_flat))
        voc_variables = jax.tree.unflatten(voc_def, list(voc_flat))
        out = model.apply(
            variables,
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
        B = out.mel_postnet.shape[0]
        wavs = vocode(
            voc_variables,
            jnp.concatenate([out.mel_postnet, out.mel_postnet_noisy], axis=0),
        )
        return {
            "mel_postnet": out.mel_postnet,
            "mel_postnet_noisy": out.mel_postnet_noisy,
            "wav": wavs[:B],
            "wav_noisy": wavs[B:],
            "mel_len": out.mel_len,
            "f0": out.p_prediction,
            "energy": out.e_prediction,
            "log_d": out.log_d_prediction,
        }

    return fn


def _weight_specs(synth) -> Tuple[List, List]:
    def specs(tree):
        return [
            jax.ShapeDtypeStruct(np.shape(x), jnp.result_type(x))
            for x in jax.tree.leaves(tree)
        ]

    return specs(synth.variables), specs(synth.vocoder_variables)


def export_serving_program(
    synth,
    src_bucket: int,
    mel_bucket: int,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    fused: bool = False,
):
    """Trace + lower one (batch, src_bucket, mel_bucket) serving program
    and return the `jax.export.Exported` (call `.serialize()` for bytes)."""
    from jax import export as jax_export

    cfg = synth.config
    M_out = cfg.mel_buckets[-1]
    fn = make_serving_fn(synth, M_out, fused=fused)
    f32, i32 = jnp.float32, jnp.int32
    model_specs, voc_specs = _weight_specs(synth)
    arg_specs = (
        model_specs,
        voc_specs,
        jax.ShapeDtypeStruct((batch, src_bucket), i32),
        jax.ShapeDtypeStruct((batch,), i32),
        jax.ShapeDtypeStruct((batch, mel_bucket, cfg.n_mel_channels), f32),
        jax.ShapeDtypeStruct((batch, mel_bucket), f32),
        jax.ShapeDtypeStruct((batch, mel_bucket), f32),
        jax.ShapeDtypeStruct((batch,), i32),
        jax.ShapeDtypeStruct((batch, cfg.speaker_embed_dim), f32),
        jax.ShapeDtypeStruct((), f32),
        jax.ShapeDtypeStruct((), f32),
        jax.ShapeDtypeStruct((), f32),
    )
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    return jax_export.export(jax.jit(fn), **kwargs)(*arg_specs)


def save_serving_bundle(
    synth,
    out_dir: str,
    src_buckets: Optional[Sequence[int]] = None,
    mel_buckets: Optional[Sequence[int]] = None,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    fused: bool = False,
) -> Dict:
    """Export one program per (src_bucket, mel_bucket) pair + the weights
    blob + manifest into ``out_dir``. Returns the manifest dict."""
    cfg = synth.config
    src_buckets = tuple(src_buckets or cfg.src_buckets)
    mel_buckets = tuple(mel_buckets or cfg.mel_buckets)
    os.makedirs(out_dir, exist_ok=True)

    blob = {}
    for i, leaf in enumerate(jax.tree.leaves(synth.variables)):
        blob[f"m{i:03d}"] = np.asarray(leaf)
    for i, leaf in enumerate(jax.tree.leaves(synth.vocoder_variables)):
        blob[f"v{i:03d}"] = np.asarray(leaf)
    np.savez(os.path.join(out_dir, "weights.npz"), **blob)

    entries = []
    for L in src_buckets:
        for M in mel_buckets:
            exp = export_serving_program(
                synth, L, M, batch=batch, platforms=platforms, fused=fused
            )
            name = _entry_name(batch, L, M)
            with open(os.path.join(out_dir, name + ".jaxexp"), "wb") as f:
                f.write(exp.serialize())
            entries.append(
                {"name": name, "batch": batch, "src_bucket": L, "mel_bucket": M}
            )

    manifest = {
        "format": "styler_tpu.serving_bundle.v1",
        "entries": entries,
        "weights": "weights.npz",
        "platforms": list(platforms) if platforms else None,
        "fused_vocoder": bool(fused),
        "audio": {
            "sampling_rate": cfg.sampling_rate,
            "hop_length": cfg.hop_length,
            "n_mel_channels": cfg.n_mel_channels,
            "mel_out": cfg.mel_buckets[-1],
        },
        "speaker_embed_dim": cfg.speaker_embed_dim,
        "vocoder": cfg.vocoder,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingBundle:
    """Load + run an exported bundle with no model-building code.

    >>> b = ServingBundle(path)
    >>> out = b.synthesize(ids, mel, f0_norm, energy01)   # numpy in/out
    """

    def __init__(self, bundle_dir: str):
        from jax import export as jax_export

        self.dir = bundle_dir
        with open(os.path.join(bundle_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        npz = np.load(os.path.join(bundle_dir, self.manifest["weights"]))
        self._model_flat = [
            npz[k] for k in sorted(k for k in npz.files if k.startswith("m"))
        ]
        self._voc_flat = [
            npz[k] for k in sorted(k for k in npz.files if k.startswith("v"))
        ]
        self._exported = {}
        for e in self.manifest["entries"]:
            with open(os.path.join(bundle_dir, e["name"] + ".jaxexp"), "rb") as f:
                self._exported[(e["batch"], e["src_bucket"], e["mel_bucket"])] = (
                    jax_export.deserialize(bytearray(f.read()))
                )

    def _bucket(self, idx: int, n: int) -> int:
        opts = sorted({k[idx] for k in self._exported})
        for o in opts:
            if n <= o:
                return o
        raise ValueError(f"no exported bucket >= {n} (have {opts})")

    def call(self, batch, src_bucket, mel_bucket, *arrays):
        exp = self._exported[(batch, src_bucket, mel_bucket)]
        return exp.call(self._model_flat, self._voc_flat, *arrays)

    def synthesize(
        self,
        ids: np.ndarray,
        mel: np.ndarray,
        f0_norm: np.ndarray,
        energy01: np.ndarray,
        speaker_embed: Optional[np.ndarray] = None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ) -> Dict:
        """One sentence (phoneme ids) + reference features -> dict of
        numpy outputs, padding into the nearest exported bucket pair."""
        a = self.manifest["audio"]
        batches = sorted({k[0] for k in self._exported})
        B = batches[0]
        L = self._bucket(1, len(ids))
        ref_len = len(f0_norm)
        M = self._bucket(2, ref_len)
        src_seq = np.zeros((B, L), np.int32)
        src_seq[0, : len(ids)] = ids
        mel_in = np.zeros((B, M, a["n_mel_channels"]), np.float32)
        mel_in[0, :ref_len] = mel[:ref_len]
        f0 = np.zeros((B, M), np.float32)
        f0[0, :ref_len] = f0_norm[:ref_len]
        en = np.zeros((B, M), np.float32)
        en[0, :ref_len] = energy01[:ref_len]
        spk = np.zeros((B, self.manifest["speaker_embed_dim"]), np.float32)
        if speaker_embed is not None:
            spk[0] = np.ravel(speaker_embed)
        out = self.call(
            B, L, M,
            src_seq,
            np.full(B, len(ids), np.int32),
            mel_in,
            f0,
            en,
            np.full(B, ref_len, np.int32),
            spk,
            np.float32(d_control),
            np.float32(p_control),
            np.float32(e_control),
        )
        ml = int(np.asarray(out["mel_len"])[0])
        ns = ml * a["hop_length"]
        return {
            "mel": np.asarray(out["mel_postnet"])[0, :ml],
            "mel_noisy": np.asarray(out["mel_postnet_noisy"])[0, :ml],
            "wav": np.asarray(out["wav"])[0, :ns],
            "wav_noisy": np.asarray(out["wav_noisy"])[0, :ns],
            "f0": np.asarray(out["f0"])[0, :ml],
            "energy": np.asarray(out["energy"])[0, :ml],
            "mel_len": ml,
        }


class BundleSynthesizer:
    """Serving adapter with the `Synthesizer.synthesize` surface (text +
    ReferenceFeatures + speaker embed -> result dict) over an exported
    bundle, so `cli/serve.py --bundle dir/` serves from the AOT artifact
    instead of building the model. Text/G2P and the mel front end still
    come from the library (host-side, no jitted model code); the device
    program is the deserialized export.

    Bucket note: requests land in the bundle's exported buckets — export
    with the same `--src_buckets/--mel_buckets` you plan to serve."""

    def __init__(self, bundle_dir: str, config):
        from styler_tpu.dsp.mel import MelFrontend
        from styler_tpu.textproc import G2p, text_to_sequence, to_phoneme_string

        self.bundle = ServingBundle(bundle_dir)
        self.config = config
        self.frontend = MelFrontend(config)
        self._g2p = G2p()
        self._to_phoneme_string = to_phoneme_string
        self._text_to_sequence = text_to_sequence

    def text_to_ids(self, sentence: str) -> np.ndarray:
        return np.asarray(
            self._text_to_sequence(
                self._to_phoneme_string(sentence, self._g2p),
                list(self.config.text_cleaners),
            ),
            dtype=np.int32,
        )

    def synthesize(
        self,
        sentence: str,
        ref,
        speaker_embed: np.ndarray,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ) -> Dict:
        ids = self.text_to_ids(sentence)
        return self.bundle.synthesize(
            ids,
            ref.mel[: ref.mel_len],
            ref.f0_norm[: ref.mel_len],
            ref.energy01[: ref.mel_len],
            speaker_embed,
            d_control=d_control,
            p_control=p_control,
            e_control=e_control,
        )

    def synthesize_batch(
        self, sentences, refs, speaker_embeds, mesh=None,
        d_control: float = 1.0, p_control: float = 1.0, e_control: float = 1.0,
    ):
        """Sequential fallback (the bundle holds batch-1 programs unless
        exported with --batch N; live Synthesizer batches in one dispatch)."""
        return [
            self.synthesize(s, r, e, d_control, p_control, e_control)
            for s, r, e in zip(sentences, refs, speaker_embeds)
        ]
