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

    Vocoder-pass policy mirrors the live ``Synthesizer._forward``: the
    clean+noisy mels go through ONE concatenated 2B vocoder pass only on
    the fused path (or tiny batches) — the XLA conv path's HBM
    intermediates scale with batch, and 2B passes at batch 16 would OOM
    where two B passes do not.
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
        if fused or B <= 4:
            wavs = vocode(
                voc_variables,
                jnp.concatenate(
                    [out.mel_postnet, out.mel_postnet_noisy], axis=0
                ),
            )
            wav, wav_noisy = wavs[:B], wavs[B:]
        else:
            wav = vocode(voc_variables, out.mel_postnet)
            wav_noisy = vocode(voc_variables, out.mel_postnet_noisy)
        return {
            "mel_postnet": out.mel_postnet,
            "mel_postnet_noisy": out.mel_postnet_noisy,
            "wav": wav,
            "wav_noisy": wav_noisy,
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
    max_mel_len: Optional[int] = None,
):
    """Trace + lower one (batch, src_bucket, mel_bucket) serving program
    and return the `jax.export.Exported` (call `.serialize()` for bytes).

    ``max_mel_len`` is the decode/output mel cap; defaults to the
    config's largest bucket. `save_serving_bundle` threads its effective
    (possibly overridden) bucket list here so the output cap never drops
    below the exported input bucket."""
    from jax import export as jax_export

    cfg = synth.config
    M_out = max_mel_len or cfg.mel_buckets[-1]
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
    batch=1,
    platforms: Optional[Sequence[str]] = None,
    fused: bool = False,
) -> Dict:
    """Export one program per (batch, src_bucket, mel_bucket) triple +
    the weights blob + manifest into ``out_dir``. ``batch`` may be an int
    or a sequence of batch sizes (e.g. ``(1, 8)`` so batched serve
    requests keep single-dispatch batching). Returns the manifest dict."""
    cfg = synth.config
    src_buckets = tuple(src_buckets or cfg.src_buckets)
    mel_buckets = tuple(mel_buckets or cfg.mel_buckets)
    batches = (batch,) if isinstance(batch, int) else tuple(batch)
    # Output mel cap follows the EFFECTIVE bucket list: an override
    # larger than the config's must not get outputs silently capped
    # below its own input bucket.
    mel_out = max(mel_buckets)
    os.makedirs(out_dir, exist_ok=True)

    blob, model_keys, voc_keys = {}, [], []
    for i, leaf in enumerate(jax.tree.leaves(synth.variables)):
        k = f"m{i:05d}"
        blob[k] = np.asarray(leaf)
        model_keys.append(k)
    for i, leaf in enumerate(jax.tree.leaves(synth.vocoder_variables)):
        k = f"v{i:05d}"
        blob[k] = np.asarray(leaf)
        voc_keys.append(k)
    np.savez(os.path.join(out_dir, "weights.npz"), **blob)

    entries = []
    for B in batches:
        for L in src_buckets:
            for M in mel_buckets:
                exp = export_serving_program(
                    synth, L, M, batch=B, platforms=platforms, fused=fused,
                    max_mel_len=mel_out,
                )
                name = _entry_name(B, L, M)
                with open(os.path.join(out_dir, name + ".jaxexp"), "wb") as f:
                    f.write(exp.serialize())
                entries.append(
                    {"name": name, "batch": B, "src_bucket": L, "mel_bucket": M}
                )

    manifest = {
        "format": "styler_tpu.serving_bundle.v1",
        "entries": entries,
        "weights": "weights.npz",
        # Explicit ordered key lists: lexicographic reloads broke at
        # >=1000 leaves ('m1000' < 'm999'); the manifest is now the
        # ordering contract, with leaf counts asserted at load.
        "model_weight_keys": model_keys,
        "vocoder_weight_keys": voc_keys,
        "platforms": list(platforms) if platforms else None,
        "fused_vocoder": bool(fused),
        "audio": {
            "sampling_rate": cfg.sampling_rate,
            "hop_length": cfg.hop_length,
            "n_mel_channels": cfg.n_mel_channels,
            "mel_out": mel_out,
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
        # Ordering contract: the manifest's explicit key lists (v1
        # bundles written before the lists existed fall back to NUMERIC
        # sort — lexicographic silently scrambles leaves at >=1000).
        numeric = lambda pfx: sorted(
            (k for k in npz.files if k.startswith(pfx)),
            key=lambda k: int(k[1:]),
        )
        model_keys = self.manifest.get("model_weight_keys") or numeric("m")
        voc_keys = self.manifest.get("vocoder_weight_keys") or numeric("v")
        assert len(model_keys) + len(voc_keys) == len(npz.files), (
            f"weights.npz has {len(npz.files)} arrays; manifest lists "
            f"{len(model_keys)}+{len(voc_keys)}"
        )
        self._model_flat = [npz[k] for k in model_keys]
        self._voc_flat = [npz[k] for k in voc_keys]
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

    def _pick_batch(self, n: int) -> int:
        """Smallest exported batch >= n, else the largest (callers chunk)."""
        batches = sorted({k[0] for k in self._exported})
        for b in batches:
            if n <= b:
                return b
        return batches[-1]

    def warmup(self) -> int:
        """Run every exported program once on zero inputs so no real
        request pays a first-dispatch cost. Returns the program count."""
        a = self.manifest["audio"]
        spk_dim = self.manifest["speaker_embed_dim"]
        for (B, L, M) in self._exported:
            out = self.call(
                B, L, M,
                np.zeros((B, L), np.int32),
                np.ones(B, np.int32),
                np.zeros((B, M, a["n_mel_channels"]), np.float32),
                np.zeros((B, M), np.float32),
                np.zeros((B, M), np.float32),
                np.ones(B, np.int32),
                np.zeros((B, spk_dim), np.float32),
                np.float32(1.0), np.float32(1.0), np.float32(1.0),
            )
            # force execution with a real host fetch: on the axon
            # platform dispatch is lazy and block_until_ready does not
            # block (CLAUDE.md) — without this, the "warmed" program
            # would still compile on the first real request
            float(np.asarray(out["mel_len"])[0])
        return len(self._exported)

    def _clamp_row(self, ids, mel, f0_norm, energy01):
        """Bound one row to the largest exported buckets; the final bool
        says whether anything was cut (surfaced as ``truncated`` in the
        result dict so callers/clients see the content loss)."""
        import logging

        log = logging.getLogger("styler_tpu.export")
        L_max = max(k[1] for k in self._exported)
        M_max = max(k[2] for k in self._exported)
        cut = False
        if len(ids) > L_max:
            log.warning(
                "sentence has %d phonemes > largest exported src bucket "
                "%d; truncating", len(ids), L_max,
            )
            ids = ids[:L_max]
            cut = True
        if len(f0_norm) > M_max:
            log.warning(
                "reference has %d mel frames > largest exported mel "
                "bucket %d; trimming", len(f0_norm), M_max,
            )
            mel, f0_norm, energy01 = mel[:M_max], f0_norm[:M_max], energy01[:M_max]
            cut = True
        return ids, mel, f0_norm, energy01, cut

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
        numpy outputs, padding into the nearest exported bucket pair.
        Inputs past the largest exported bucket are truncated with a
        warning (matching the live Synthesizer's clamp policy)."""
        return self.synthesize_batch(
            [ids], [mel], [f0_norm], [energy01],
            None if speaker_embed is None else [speaker_embed],
            d_control=d_control, p_control=p_control, e_control=e_control,
        )[0]

    def synthesize_batch(
        self,
        ids_list,
        mels,
        f0_norms,
        energy01s,
        speaker_embeds=None,
        d_control: float = 1.0,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ) -> List[Dict]:
        """N items through the exported batch-B programs: the request is
        padded up to the smallest exported batch that holds it (one
        dispatch), or chunked by the largest exported batch when it
        exceeds every exported size — the AOT counterpart of the live
        `Synthesizer.synthesize_batch` single-dispatch path."""
        n = len(ids_list)
        assert n > 0, "empty batch"
        rows = [
            self._clamp_row(ids_list[i], mels[i], f0_norms[i], energy01s[i])
            for i in range(n)
        ]
        results: List[Dict] = []
        i = 0
        while i < n:
            B = self._pick_batch(n - i)
            take = min(B, n - i)
            results.extend(
                self._call_group(
                    rows[i : i + take],
                    None if speaker_embeds is None
                    else speaker_embeds[i : i + take],
                    B, d_control, p_control, e_control,
                )
            )
            i += take
        return results

    def _call_group(self, rows, spk_rows, B, d_control, p_control, e_control):
        a = self.manifest["audio"]
        n = len(rows)
        L = self._bucket(1, max(len(r[0]) for r in rows))
        M = self._bucket(2, max(len(r[2]) for r in rows))
        src_seq = np.zeros((B, L), np.int32)
        src_len = np.ones(B, np.int32)
        mel_in = np.zeros((B, M, a["n_mel_channels"]), np.float32)
        f0 = np.zeros((B, M), np.float32)
        en = np.zeros((B, M), np.float32)
        mel_len = np.ones(B, np.int32)
        spk = np.zeros((B, self.manifest["speaker_embed_dim"]), np.float32)
        for i in range(B):
            ids, m, f, e, _ = rows[min(i, n - 1)]  # pad rows repeat the last
            k = len(f)
            src_seq[i, : len(ids)] = ids
            src_len[i] = len(ids)
            mel_in[i, :k] = m[:k]
            f0[i, :k] = f[:k]
            en[i, :k] = e[:k]
            mel_len[i] = k
            if spk_rows is not None:
                spk[i] = np.ravel(spk_rows[min(i, n - 1)])
        out = self.call(
            B, L, M,
            src_seq, src_len, mel_in, f0, en, mel_len, spk,
            np.float32(d_control), np.float32(p_control), np.float32(e_control),
        )
        results = []
        for i in range(n):
            ml = int(np.asarray(out["mel_len"])[i])
            ns = ml * a["hop_length"]
            results.append(
                {
                    "mel": np.asarray(out["mel_postnet"])[i, :ml],
                    "mel_noisy": np.asarray(out["mel_postnet_noisy"])[i, :ml],
                    "wav": np.asarray(out["wav"])[i, :ns],
                    "wav_noisy": np.asarray(out["wav_noisy"])[i, :ns],
                    "f0": np.asarray(out["f0"])[i, :ml],
                    "energy": np.asarray(out["energy"])[i, :ml],
                    "mel_len": ml,
                    "truncated": rows[i][4],
                }
            )
        return results


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
        ids_rows=None,
    ):
        """Batched AOT serving: the request runs through the bundle's
        exported batch-N programs (padded to the smallest exported batch
        that holds it; chunked by the largest otherwise) — single
        dispatch per group, matching the live path's batching. Export
        with ``--batch 1 8`` to cover both interactive and batched
        traffic. ``mesh`` is accepted for signature parity and ignored
        (sharding is baked at export time)."""
        ids = ids_rows if ids_rows is not None else [
            self.text_to_ids(s) for s in sentences
        ]
        return self.bundle.synthesize_batch(
            ids,
            [r.mel[: r.mel_len] for r in refs],
            [r.f0_norm[: r.mel_len] for r in refs],
            [r.energy01[: r.mel_len] for r in refs],
            speaker_embeds,
            d_control=d_control, p_control=p_control, e_control=e_control,
        )

    def warmup(self) -> int:
        """Compile-warm every exported program (see ServingBundle.warmup)
        plus the mel front end's common wav-length buckets — reference
        feature extraction on the first request otherwise pays the
        frontend compile (measured ~3-4 s of the first bundle-serve
        request on a v5e)."""
        n = self.bundle.warmup()
        for F in (256, 1024):
            self.frontend(
                np.zeros((F - 1) * self.config.hop_length, np.float32)
            )
        return n
