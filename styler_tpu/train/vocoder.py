"""TPU-native vocoder (GAN) training: one fused jitted step.

Beyond-reference capability (the reference only loads pretrained
vocoders, utils.py:250-271): trains / fine-tunes the JAX HiFi-GAN
Generator (vocoder/hifigan.py) against the MPD+MSD discriminators
(vocoder/discriminators.py) with the published HiFi-GAN objective
(Kong et al. 2020):

  L_D = Σ_k E[(1 - D_k(y))²] + E[D_k(ŷ)²]               (LSGAN)
  L_G = Σ_k E[(1 - D_k(ŷ))²] + 2·L_fm + 45·L_mel
  L_fm = Σ_k Σ_layers E|f_real - f_fake|
  L_mel = E|logmel(y) - logmel(ŷ)|

One optimizer update = one XLA program: discriminator step (vs the
frozen generator output) then generator step against the UPDATED
discriminator — the same ordering as the published recipe's two
sequential backward passes, fused on device. AdamW(2e-4, β=(0.8, 0.99)),
optional per-step exponential decay standing in for the recipe's
per-epoch γ=0.999.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from styler_tpu.dsp.mel import MelFrontend
from styler_tpu.vocoder.discriminators import HiFiGANDiscriminator
from styler_tpu.vocoder.hifigan import Generator


class GANState(NamedTuple):
    gen_params: dict
    gen_opt: optax.OptState
    disc_params: dict
    disc_opt: optax.OptState
    step: jnp.ndarray


def _wn_axes(kernel_ndim: int, transposed: bool):
    """Norm-reduction axes for weight norm, matching torch's
    ``weight_norm(..., dim=0)`` as used throughout the published HiFi-GAN
    (hifigan/models.py wraps every conv): per-OUT-channel for Conv1d/2d,
    per-IN-channel for ConvTranspose1d (torch transposed weights are
    [in, out, k], so dim=0 is the input channel). Our layouts are
    channels-last flax kernels [..., in, out] and ConvTranspose1dTorch
    kernels [k, in, out]."""
    if transposed:
        return tuple(i for i in range(kernel_ndim) if i != kernel_ndim - 2)
    return tuple(range(kernel_ndim - 1))


def wn_split(params: dict) -> dict:
    """Reparameterize every conv kernel as weight-norm (g, v) pairs:
    ``kernel = g * v / ||v||`` with g initialized to ``||kernel||`` so
    ``wn_fold(wn_split(p)) == p``. Training in this parameterization
    reproduces the published recipe's optimization geometry (direction /
    magnitude decoupling), which plain folded-kernel training loses.
    Biases and non-conv leaves pass through untouched."""

    def rec(d, transposed):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = rec(v, k.startswith("ups_"))
            elif k == "kernel" and hasattr(v, "ndim") and v.ndim >= 3:
                axes = _wn_axes(v.ndim, transposed)
                out["kernel_g"] = jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=axes, keepdims=True)
                )
                out["kernel_v"] = v
            else:
                out[k] = v
        return out

    return rec(params, False)


def wn_fold(wn_params: dict) -> dict:
    """Inverse of :func:`wn_split`: reconstitute plain kernels
    (``g * v / ||v||``) for inference / checkpoint export. Cheap enough
    to run inside the jitted train step every iteration (the norms are
    tiny reductions next to the conv FLOPs)."""

    def rec(d, transposed):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = rec(v, k.startswith("ups_"))
            elif k == "kernel_v":
                axes = _wn_axes(v.ndim, transposed)
                norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
                out["kernel"] = d["kernel_g"] * v / norm
            elif k == "kernel_g":
                continue
            else:
                out[k] = v
        return out

    return rec(wn_params, False)


def make_mel_fn(config):
    """Jittable wav [B, T] -> log-mel [B, F, n_mels] for the mel loss —
    literally the data pipeline's MelFrontend analysis core
    (``_mel_energy_prepadded``) vmapped over a reflect-padded batch, so
    the GAN objective can never drift from the dataset's mel
    definition."""
    fe = MelFrontend(config)
    pad = fe.n_fft // 2

    def mel(wav):
        def one(w):
            xp = jnp.pad(w, (pad, pad), mode="reflect")
            m, _ = fe._mel_energy_prepadded(xp)
            return m.T  # [F, n_mels]

        return jax.vmap(one)(wav)

    return mel


def make_mr_stft_loss_fn(fft_sizes=(512, 1024, 2048), hop_ratio=4):
    """Multi-resolution STFT loss (Yamamoto et al., Parallel WaveGAN):
    spectral convergence + log-magnitude L1 averaged over resolutions.
    Optional extra term for GAN training (sharper high frequencies than
    the mel loss alone — useful for the iSTFTNet head)."""

    def loss(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        # resolutions longer than the segment contribute no frames
        sizes = [n for n in fft_sizes if n <= y.shape[-1]]
        total = 0.0
        for n_fft in sizes:
            hop = n_fft // hop_ratio
            win = jnp.hanning(n_fft + 1)[:-1]

            def mag(w, n_fft=n_fft, hop=hop, win=win):
                T = (w.shape[-1] - n_fft) // hop + 1
                idx = (
                    jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
                )
                frames = w[:, idx] * win
                spec = jnp.fft.rfft(frames, axis=-1)
                # eps INSIDE the sqrt: jnp.abs(complex) has an undefined
                # gradient at exactly-zero bins
                return jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-12)

            m_hat, m = mag(y_hat), mag(y)
            sc = jnp.linalg.norm(m - m_hat) / (jnp.linalg.norm(m) + 1e-7)
            log_l1 = jnp.mean(jnp.abs(jnp.log(m) - jnp.log(m_hat)))
            total = total + sc + log_l1
        return total / max(len(sizes), 1)

    return loss


def make_optimizer(
    learning_rate: float = 2e-4,
    betas=(0.8, 0.99),
    weight_decay: float = 1e-2,
    decay_gamma: Optional[float] = None,
    decay_every: int = 1000,
):
    lr = learning_rate
    if decay_gamma is not None:
        lr = optax.exponential_decay(
            learning_rate, transition_steps=decay_every, decay_rate=decay_gamma
        )
    return optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)


def create_gan_state(
    config,
    rng: jax.Array,
    segment_frames: int = 32,
    generator: Optional[Generator] = None,
    gen_params: Optional[dict] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    weight_norm: bool = False,
):
    """Initialize generator (fresh or from imported params) +
    discriminator + both optimizer states.

    ``weight_norm=True`` stores BOTH param trees in the (g, v)
    parameterization (:func:`wn_split`) — the published HiFi-GAN trains
    every conv under torch ``weight_norm`` (hifigan/models.py) and folds
    it only for inference (models.py:167-174). Pass the same flag to
    :func:`make_gan_train_step`, and fold with :func:`wn_fold` before
    saving / serving. Warm-started ``gen_params`` (imported checkpoints
    arrive folded) are split automatically. Known deviation: the
    published recipe puts SPECTRAL norm (not weight norm) on the first
    MSD scale; here all discriminator convs use weight norm."""
    gen = generator or Generator(compute_dtype=jnp.float32)
    disc = HiFiGANDiscriminator()
    hop = config.hop_length
    mel0 = jnp.zeros((1, segment_frames, config.n_mel_channels))
    wav0 = jnp.zeros((1, segment_frames * hop))
    if gen_params is None:
        gen_params = jax.jit(gen.init)(rng, mel0)["params"]
    disc_params = jax.jit(disc.init)(jax.random.split(rng)[0], wav0)["params"]
    if weight_norm:
        gen_params = wn_split(gen_params)
        disc_params = wn_split(disc_params)
    opt = optimizer or make_optimizer()
    return gen, disc, opt, GANState(
        gen_params=gen_params,
        gen_opt=opt.init(gen_params),
        disc_params=disc_params,
        disc_opt=opt.init(disc_params),
        step=jnp.zeros((), jnp.int32),
    )


def make_gan_train_step(
    gen: Generator,
    disc: HiFiGANDiscriminator,
    opt,
    config,
    mr_stft_weight: float = 0.0,
    weight_norm: bool = False,
):
    """Returns jitted step(state, mel [B,F,80], wav [B,F*hop]) ->
    (state, metrics). mr_stft_weight > 0 adds the multi-resolution STFT
    loss to the generator objective. weight_norm=True expects the state's
    param trees in the (g, v) parameterization (create_gan_state
    ``weight_norm=True``) and folds them inside the step — gradients and
    optimizer moments then live in weight-norm space, matching the
    published recipe's dynamics."""
    mel_fn = make_mel_fn(config)
    mr_fn = make_mr_stft_loss_fn() if mr_stft_weight > 0 else None
    g_fold = wn_fold if weight_norm else (lambda p: p)
    d_fold = wn_fold if weight_norm else (lambda p: p)

    def step(state: GANState, mel: jnp.ndarray, wav: jnp.ndarray):
        yhat_detached = gen.apply({"params": g_fold(state.gen_params)}, mel)

        # ---- discriminator update (generator frozen) ----
        def d_loss_fn(dp):
            dp = d_fold(dp)
            lr_, _ = disc.apply({"params": dp}, wav)
            lf_, _ = disc.apply({"params": dp}, yhat_detached)
            loss = sum(
                jnp.mean((1.0 - r) ** 2) + jnp.mean(f**2)
                for r, f in zip(lr_, lf_)
            )
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, d_opt = opt.update(
            d_grads, state.disc_opt, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update (vs the updated discriminator) ----
        mel_real = mel_fn(wav)

        def g_loss_fn(gp):
            yhat = gen.apply({"params": g_fold(gp)}, mel)
            lf_, ff_ = disc.apply({"params": d_fold(disc_params)}, yhat)
            _, fr_ = disc.apply({"params": d_fold(disc_params)}, wav)
            adv = sum(jnp.mean((1.0 - f) ** 2) for f in lf_)
            fm = sum(
                jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - f))
                for fr, ff in zip(fr_, ff_)
                for r, f in zip(fr, ff)
            )
            mel_hat = mel_fn(yhat)
            F = mel_real.shape[1]
            mel_l1 = jnp.mean(jnp.abs(mel_real - mel_hat[:, :F]))
            total = adv + 2.0 * fm + 45.0 * mel_l1
            if mr_fn is not None:
                total = total + mr_stft_weight * mr_fn(yhat, wav)
            return total, (adv, fm, mel_l1)

        (g_loss, (adv, fm, mel_l1)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.gen_params)
        g_updates, g_opt = opt.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = GANState(
            gen_params=gen_params,
            gen_opt=g_opt,
            disc_params=disc_params,
            disc_opt=d_opt,
            step=state.step + 1,
        )
        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "g_adv": adv,
            "g_fm": fm,
            "g_mel_l1": mel_l1,
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def sample_segments(
    rng: np.random.Generator,
    wavs,
    mels,
    batch_size: int,
    segment_frames: int,
    hop: int,
):
    """Host-side random (mel, wav) aligned segment cropper.

    wavs: list of [T_i] float32 in [-1, 1]; mels: list of [F_i, n_mels]
    with F_i = T_i // hop + 1 (the data pipeline contract)."""
    seg_wav = segment_frames * hop
    mb, wb = [], []
    for _ in range(batch_size):
        i = int(rng.integers(len(wavs)))
        w, m = wavs[i], mels[i]
        max_start = max(0, m.shape[0] - segment_frames - 1)
        f0 = int(rng.integers(max_start + 1))
        mseg = m[f0 : f0 + segment_frames]
        wseg = w[f0 * hop : f0 * hop + seg_wav]
        if mseg.shape[0] < segment_frames:
            mseg = np.pad(mseg, ((0, segment_frames - mseg.shape[0]), (0, 0)))
        if len(wseg) < seg_wav:
            wseg = np.pad(wseg, (0, seg_wav - len(wseg)))
        mb.append(mseg)
        wb.append(wseg)
    return np.stack(mb).astype(np.float32), np.stack(wb).astype(np.float32)
