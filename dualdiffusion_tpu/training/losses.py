"""Training loss library (pure JAX).

Capability parity with the reference's standalone loss lib
(reference: src/training/loss/, 746 LoC):

  * MSSLoss1D — multi-window spectral L1 + phase-wrap-aware phase loss
    weighted by magnitude and mel density (multiscale_spectral.py:41-119).
  * MSSLoss2D — unfold+rfft2 multi-scale 2D spectral loss with
    flat-top/hann/kaiser/circular windows, product/f^2/dynamic frequency
    weighting, mid/side transform, l1 or mse, optional complex phase terms
    (multiscale_spectral.py:121-297). This is the op the reference intended
    to fuse into a CUDA kernel (SURVEY.md §2.9 item 1) — the Pallas fusion
    lives in ops/pallas/; this is the reference implementation.
  * SpecRegLoss — match the latent spectrum to a target spectral profile
    (spectral_regularization.py:41-103).
  * WaveletLoss — per-level L1 on a Laplacian pyramid with 4^(-i*e) weights
    (wavelet.py:39-84).
  * DoGLoss2D — difference-of-gaussians pyramid NLL with learned per-scale
    logvar (difference_of_gaussians.py:31-90).
  * equivariance_loss — latent shift-equivariance penalty
    (equivariance.py:63-101).

Layouts: audio losses take (B, C, T); 2D losses take channel-last
(B, H, W, C).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Literal, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mp
from ..ops import get_window, mel_density, stft
from ..ops.stft import frame_signal


# ---------------------------------------------------------------------------
# 1D multi-scale spectral loss
# ---------------------------------------------------------------------------

@dataclass
class MSSLoss1DConfig:
    block_widths: Tuple[int, ...] = (64, 128, 256, 512, 1024, 2048, 4096,
                                     8192, 16384, 32768)
    block_overlap: int = 2
    sample_rate: float = 32000
    loss_scale: float = 1.0


class MSSLoss1D:
    def __init__(self, config: MSSLoss1DConfig) -> None:
        self.config = config
        self.windows = {}
        self.loss_weights = {}
        for bw in config.block_widths:
            self.windows[bw] = get_window("hann", bw, periodic=True)
            freqs = np.fft.rfftfreq(bw) * config.sample_rate
            w = np.asarray(mel_density(freqs), np.float64)
            self.loss_weights[bw] = (w / w.max() / np.pi).astype(np.float32)

    def __call__(self, sample: jnp.ndarray, target: jnp.ndarray):
        """(B, C, T) -> (abs_loss (B,), phase_loss (B,))."""
        cfg = self.config
        loss = jnp.zeros((target.shape[0],), jnp.float32)
        phase_loss = jnp.zeros_like(loss)
        for bw in cfg.block_widths:
            if bw > target.shape[-1]:
                continue
            hop = max(bw // cfg.block_overlap, 1)
            win = self.windows[bw] / np.sqrt((self.windows[bw] ** 2).sum())
            t_fft = stft(jax.lax.stop_gradient(target), win, bw, hop)
            s_fft = stft(sample, win, bw, hop)
            t_abs = jnp.abs(t_fft)
            s_abs = jnp.abs(s_fft)
            lw = jnp.asarray(self.loss_weights[bw])
            loss = loss + jnp.mean(jnp.abs(s_abs - t_abs), axis=(1, 2, 3))
            t_ang = jnp.angle(t_fft)
            s_ang = jnp.angle(s_fft)
            perr = jnp.abs(s_ang - t_ang)
            perr = jnp.where(perr > np.pi, 2 * np.pi - perr, perr)
            plw = (t_abs - t_abs.min(axis=-1, keepdims=True)) * lw
            phase_loss = phase_loss + jnp.mean(perr * jax.lax.stop_gradient(plw),
                                               axis=(1, 2, 3))
        return loss * cfg.loss_scale, phase_loss * cfg.loss_scale


# ---------------------------------------------------------------------------
# 2D multi-scale spectral loss
# ---------------------------------------------------------------------------

def _flat_top(x: np.ndarray) -> np.ndarray:
    return (0.21557895 - 0.41663158 * np.cos(x) + 0.277263158 * np.cos(2 * x)
            - 0.083578947 * np.cos(3 * x) + 0.006947368 * np.cos(4 * x))


def _window_2d(name: str, bw: int) -> np.ndarray:
    if name == "flat_top":
        wx = np.arange(bw) / bw * 2 * np.pi
        w = _flat_top(wx)[:, None] * _flat_top(wx)[None, :]
    elif name == "hann":
        wx = np.arange(bw) / bw * np.pi
        w = (np.sin(wx) ** 2)[:, None] * (np.sin(wx) ** 2)[None, :]
    elif name == "kaiser":
        k = get_window("kaiser", bw, beta=12.0)
        w = k[:, None] * k[None, :]
    elif name == "flat_top_circular":
        c = (np.arange(bw) + 0.5) - bw / 2
        dist = np.sqrt(c[:, None] ** 2 + c[None, :] ** 2) / (bw // 2)
        w = _flat_top(dist * np.pi + np.pi) * (dist <= 1)
    elif name == "none":
        w = np.ones((bw, bw))
    else:
        raise ValueError(f"invalid block window: {name}")
    return (w / np.sqrt((w ** 2).mean())).astype(np.float32)


def unfold_2d(x: jnp.ndarray, block: int, step: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, C, nH, nW, block, block) with reflect padding by
    block//2 (reference: multiscale_spectral.py:219-224)."""
    pad = block // 2
    x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (pad, pad)], mode="reflect")
    # frame along H: (..., H', W) -> treat via frame_signal on a moved axis
    xh = jnp.moveaxis(x, 2, -1)                          # (B, C, W, Hp)
    fh = frame_signal(xh, block, step)                   # (B, C, W, nH, block)
    fhw = jnp.moveaxis(fh, 2, -1)                        # (B, C, nH, block, W)
    fw = frame_signal(fhw, block, step)                  # (B, C, nH, block, nW, block)
    return jnp.transpose(fw, (0, 1, 2, 4, 3, 5))         # (B, C, nH, nW, bh, bw)


@dataclass
class MSSLoss2DConfig:
    block_widths: Tuple[int, ...] = (8, 16, 32, 64)
    block_overlap: int = 8
    block_width_weight_exponent: float = 0.0
    block_window_fn: str = "flat_top"
    frequency_weighting: Literal["product", "f^2", "dynamic"] = "product"
    frequency_weight_exponent: float = 1.0
    use_midside_transform: Literal["stack", "cat", "none"] = "stack"
    use_mse_loss: bool = False
    phase_loss_scale: float = 0.0
    abs_loss_scale: float = 1.0


class MSSLoss2D:
    def __init__(self, config: MSSLoss2DConfig) -> None:
        self.config = config
        self.windows = {bw: _window_2d(config.block_window_fn, bw)
                        for bw in config.block_widths}
        self.loss_weights = {}
        for bw in config.block_widths:
            fh = np.fft.fftfreq(bw, d=1.0 / bw)
            fw = np.fft.rfftfreq(bw, d=1.0 / bw)
            if config.frequency_weighting == "product":
                lw = (np.abs(fh)[:, None] + 1) * (np.abs(fw)[None, :] + 1)
            elif config.frequency_weighting == "f^2":
                lw = fh[:, None] ** 2 + fw[None, :] ** 2 + 1
            else:
                lw = None
            if lw is not None:
                self.loss_weights[bw] = lw.astype(np.float32)

    def _stft2d(self, x: jnp.ndarray, bw: int, step: int) -> jnp.ndarray:
        blocks = unfold_2d(x, bw, step) * jnp.asarray(self.windows[bw])
        fft = jnp.fft.rfft2(blocks, norm="ortho")
        ms = self.config.use_midside_transform
        if ms == "stack":
            fft = jnp.stack([fft[:, 0] + fft[:, 1], fft[:, 0] - fft[:, 1]], axis=1)
        elif ms == "cat":
            fft = jnp.concatenate(
                [fft, (fft[:, 0:1] + fft[:, 1:2]) * 0.5 ** 0.5,
                 (fft[:, 0:1] - fft[:, 1:2]) * 0.5 ** 0.5], axis=1)
        return fft

    def __call__(self, sample: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """(B, C, H, W) x2 -> per-sample loss (B,)."""
        cfg = self.config
        loss = jnp.zeros((target.shape[0],), jnp.float32)
        err_fn = (lambda a, b: (a - b) ** 2) if cfg.use_mse_loss else (lambda a, b: jnp.abs(a - b))
        for bw in cfg.block_widths:
            if bw > target.shape[-1]:
                continue
            step = max(bw // cfg.block_overlap, 1)
            t_fft = jax.lax.stop_gradient(self._stft2d(target, bw, step))
            s_fft = self._stft2d(sample, bw, step)
            t_abs = jnp.abs(t_fft)
            if cfg.frequency_weighting == "dynamic":
                lw = 1.0 / jnp.clip(t_abs.mean(axis=(0, 2, 3), keepdims=True), min=1e-2)
                lw = jax.lax.stop_gradient(lw)
            else:
                lw = jnp.asarray(self.loss_weights[bw])
            if cfg.frequency_weight_exponent != 1:
                lw = lw ** cfg.frequency_weight_exponent
            if cfg.block_width_weight_exponent != 0:
                lw = lw * bw ** cfg.block_width_weight_exponent
            block_loss = jnp.zeros_like(t_abs)
            if cfg.abs_loss_scale > 0:
                block_loss = err_fn(jnp.abs(s_fft), t_abs) * cfg.abs_loss_scale
            if cfg.phase_loss_scale > 0:
                block_loss = block_loss + (err_fn(jnp.real(s_fft), jnp.real(t_fft))
                                           + err_fn(jnp.imag(s_fft), jnp.imag(t_fft))
                                           ) * cfg.phase_loss_scale
            loss = loss + jnp.mean(block_loss * lw, axis=(1, 2, 3, 4, 5))
        return loss


# ---------------------------------------------------------------------------
# randomized-prime 2D MSS (the dae_p1 trainer's recon loss)
# ---------------------------------------------------------------------------

PRIME_BLOCKS = (9, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61,
                67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127,
                131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181, 191,
                193, 197, 199, 211, 223, 227, 229, 233, 239, 241, 251)


def _flat_top_window_rect(bh: int, bw: int) -> np.ndarray:
    xh = np.arange(bh) / bh * 2 * np.pi
    xw = np.arange(bw) / bw * 2 * np.pi
    w = _flat_top(xh)[:, None] * _flat_top(xw)[None, :]
    return (w / np.sqrt((w ** 2).mean())).astype(np.float32)


def _draw_prime_sizes(rng: np.random.Generator, n: int,
                      max_h: int, max_w: int) -> list:
    """Draw n rectangular (bh, bw) prime block sizes with ln-linear weights
    (reference: dae_p1_trainer.py:179-194 draws width and height
    independently per step with random transpose order — rectangular draws
    cover both orders)."""
    blocks = np.asarray(PRIME_BLOCKS)
    ln_w = 1.0 / np.log(blocks)
    p = ln_w / ln_w.sum()
    bh = np.minimum(rng.choice(blocks, size=n, p=p), max_h)
    bw = np.minimum(rng.choice(blocks, size=n, p=p), max_w)
    return [(int(h), int(w)) for h, w in zip(bh, bw)]


def random_prime_mss_2d(key: jax.Array, sample: jnp.ndarray, target: jnp.ndarray,
                        num_iterations: int = 16,
                        use_midside: bool = True,
                        seed: int = 0,
                        num_size_sets: int = 4) -> jnp.ndarray:
    """Randomized-prime-block 2D MSS (reference: dae_p1_trainer.py:85-213):
    each iteration draws a rectangular prime block size (ln-linear weighted),
    random offsets and a random mid/side flag, computes a flat-top-windowed
    rfft2 of ONE block position, and accumulates target-energy-normalized MSE.

    Trace-time randomness: block shapes must be static for XLA, so
    ``num_size_sets`` independent size lists are pre-drawn host-side from
    ``seed``; each call selects one set with the traced ``key`` via
    ``lax.switch``, so block sizes genuinely vary step to step under a single
    compile. Offsets and the mid/side flag stay fully traced.
    """
    h, w = target.shape[-2], target.shape[-1]
    rng = np.random.default_rng(seed)
    size_sets = [_draw_prime_sizes(rng, num_iterations, h, w)
                 for _ in range(max(num_size_sets, 1))]
    k_set, k_iter = jax.random.split(key)

    def one_set(sizes, keys):
        loss = jnp.zeros((target.shape[0],), jnp.float32)
        for i, (bh, bw) in enumerate(sizes):
            k_off, k_ms = jax.random.split(keys[i])
            oh = jax.random.randint(k_off, (), 0, max(h - bh, 0) + 1)
            ow = jax.random.randint(jax.random.fold_in(k_off, 1), (), 0,
                                    max(w - bw, 0) + 1)
            win = jnp.asarray(_flat_top_window_rect(bh, bw))
            ms_flag = use_midside & jax.random.bernoulli(k_ms)

            def spec(x):
                xs = jax.lax.dynamic_slice(
                    x, (0, 0, oh, ow), (x.shape[0], x.shape[1], bh, bw))
                ms = mp.midside_transform(xs, channel_axis=1)
                xs = jnp.where(ms_flag, ms, xs)
                return jnp.fft.rfft2(xs * win, norm="ortho")

            t_fft = jax.lax.stop_gradient(spec(target))
            s_fft = spec(sample)
            t_energy = jax.lax.stop_gradient(
                jnp.mean(jnp.abs(t_fft) ** 2, axis=(1, 2, 3)) + 1e-8)
            err = jnp.mean(jnp.abs(s_fft - t_fft) ** 2, axis=(1, 2, 3))
            loss = loss + err / t_energy
        return loss / num_iterations

    keys = jax.random.split(k_iter, num_iterations)
    branches = [functools.partial(one_set, s) for s in size_sets]
    if len(branches) == 1:
        return branches[0](keys)
    idx = jax.random.randint(k_set, (), 0, len(branches))
    return jax.lax.switch(idx, branches, keys)


# ---------------------------------------------------------------------------
# spectral regularization / wavelet / DoG / equivariance
# ---------------------------------------------------------------------------

def spec_reg_loss(latents: jnp.ndarray, target_profile: jnp.ndarray,
                  kind: Literal["l1", "mse", "kl"] = "l1") -> jnp.ndarray:
    """Match the latent rfft2 magnitude spectrum to a target spectral profile
    (reference: spectral_regularization.py:41-103). latents (B, C, H, W);
    target_profile broadcastable to the rfft2 magnitude."""
    mag = jnp.abs(jnp.fft.rfft2(latents.astype(jnp.float32), norm="ortho"))
    mag = mag / (mag.mean(axis=(-2, -1), keepdims=True) + 1e-8)
    tp = target_profile / (target_profile.mean(axis=(-2, -1), keepdims=True) + 1e-8)
    if kind == "l1":
        return jnp.mean(jnp.abs(mag - tp), axis=(1, 2, 3))
    if kind == "mse":
        return jnp.mean((mag - tp) ** 2, axis=(1, 2, 3))
    if kind == "kl":
        p = mag / (mag.sum(axis=(-2, -1), keepdims=True) + 1e-12)
        q = tp / (tp.sum(axis=(-2, -1), keepdims=True) + 1e-12)
        return jnp.sum(p * (jnp.log(p + 1e-12) - jnp.log(q + 1e-12)), axis=(1, 2, 3))
    raise ValueError(kind)


def wavelet_loss(sample: jnp.ndarray, target: jnp.ndarray, num_levels: int = 4,
                 level_exponent: float = 1.0, use_midside: bool = False) -> jnp.ndarray:
    """Per-level L1 on Laplacian pyramids with 4^(-i*e) weights
    (reference: wavelet.py:39-84). Channel-last (B, H, W, C)."""
    if use_midside:
        sample = mp.midside_transform(sample, channel_axis=-1)
        target = mp.midside_transform(target, channel_axis=-1)
    sw = mp.wavelet_decompose_2d(sample, num_levels)
    tw = mp.wavelet_decompose_2d(jax.lax.stop_gradient(target), num_levels)
    loss = jnp.zeros((target.shape[0],), jnp.float32)
    for i, (s, t) in enumerate(zip(sw, tw)):
        w = 4.0 ** (-i * level_exponent)
        loss = loss + w * jnp.mean(jnp.abs(s - t), axis=tuple(range(1, s.ndim)))
    return loss


def _gaussian_kernel_1d(size: int, sigma: Optional[float] = None) -> np.ndarray:
    sigma = sigma or (size / 6.0)
    x = np.arange(size) - (size - 1) / 2
    k = np.exp(-x ** 2 / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _blur_2d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    from ..models.layers import _sep_conv_axis
    k = _gaussian_kernel_1d(size)
    x = _sep_conv_axis(x, k, axis=-2, stride=1)
    return _sep_conv_axis(x, k, axis=-3, stride=1)


def dog_loss_2d(sample: jnp.ndarray, target: jnp.ndarray,
                logvars: jnp.ndarray,
                kernel_sizes: Sequence[int] = (3, 7, 11, 15, 19, 23, 27)):
    """Difference-of-gaussians pyramid with learned per-scale logvar NLL
    (reference: difference_of_gaussians.py:31-90). Channel-last (B,H,W,C);
    logvars: (num_scales+1,) learned parameters. Returns per-sample loss."""
    losses = []
    s_prev, t_prev = sample, jax.lax.stop_gradient(target)
    for size in kernel_sizes:
        s_blur = _blur_2d(s_prev, size)
        t_blur = _blur_2d(t_prev, size)
        sd = s_prev - s_blur
        td = t_prev - t_blur
        losses.append(jnp.mean((sd - td) ** 2, axis=(1, 2, 3)))
        s_prev, t_prev = s_blur, t_blur
    losses.append(jnp.mean((s_prev - t_prev) ** 2, axis=(1, 2, 3)))
    total = jnp.zeros_like(losses[0])
    for i, l in enumerate(losses):
        total = total + l / jnp.exp(logvars[i]) + logvars[i]
    return total


# ---------------------------------------------------------------------------
# latent regularizers (dae_p1 trainer: kl, dispersion, phase invariance)
# ---------------------------------------------------------------------------

def kl_to_unit_loss(latents: jnp.ndarray, mean_penalty: float = 1.0) -> jnp.ndarray:
    """KL(N(mu, var) || N(0,1)) per sample on pre-norm latents with an extra
    mean penalty (reference: dae_p1_trainer.py:373-383)."""
    mu = latents.mean(axis=(1, 2))
    var = latents.var(axis=(1, 2)) + 1e-8
    kl = 0.5 * (mu ** 2 * mean_penalty + var - jnp.log(var) - 1.0)
    return kl.mean(axis=-1)


def latents_dispersion_loss(latents: jnp.ndarray, shifts: Sequence[int] = (1,)) -> jnp.ndarray:
    """Repulsion of squared cosine similarity between batch-rolled latents
    (reference: dae_p1_trainer.py:345-371)."""
    flat = latents.reshape(latents.shape[0], -1)
    flat = flat / (jnp.linalg.norm(flat, axis=-1, keepdims=True) + 1e-8)
    loss = jnp.zeros((latents.shape[0],), jnp.float32)
    for s in shifts:
        other = jnp.roll(flat, s, axis=0)
        cos = jnp.sum(flat * other, axis=-1)
        loss = loss + cos ** 2
    return loss / len(shifts)


def phase_invariance_loss(latents_a: jnp.ndarray, latents_b: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity pull between latents of two encodes of the same
    audio with different phases (reference: dae_p1_trainer.py:330-343)."""
    a = latents_a.reshape(latents_a.shape[0], -1)
    b = latents_b.reshape(latents_b.shape[0], -1)
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    return 1.0 - jnp.sum(a * b, axis=-1)


def vicreg_regularization(latents: jnp.ndarray, variance_weight: float = 1.0,
                          covariance_weight: float = 1.0,
                          gamma: float = 1.0) -> jnp.ndarray:
    """VICReg-style variance + covariance latent regularizer
    (reference: dae_p1_trainer.py:35-69, available alternative to the
    dispersion loss). latents (B, H, W, C); returns a scalar."""
    b = latents.shape[0]
    z = latents.reshape(b, -1).astype(jnp.float32)
    z = z - z.mean(axis=0, keepdims=True)
    # hinge variance: encourage per-dim std >= gamma
    std = jnp.sqrt(z.var(axis=0) + 1e-4)
    var_loss = jnp.mean(jnp.maximum(gamma - std, 0.0))
    # covariance: off-diagonal energy of the (dim-subsampled) covariance
    d = min(z.shape[1], 512)
    zc = z[:, :d]
    cov = (zc.T @ zc) / max(b - 1, 1)
    off = cov - jnp.diag(jnp.diag(cov))
    cov_loss = jnp.sum(off ** 2) / d
    return var_loss * variance_weight + cov_loss * covariance_weight


# ---------------------------------------------------------------------------
# latent shift-equivariance loss
# ---------------------------------------------------------------------------

@dataclass
class EquivarianceLossConfig:
    levels: int = 4            # latent upsample factor = 2**(levels-1)
    filter_beta: float = 1.5
    filter_k_size: int = 7
    crop_range: int = 8


def _crop_per_sample(t: jnp.ndarray, yo: jnp.ndarray, xo: jnp.ndarray,
                     crop: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H-crop, W-crop, C) at per-sample (yo, xo)."""
    b, h, w, c = t.shape

    def one(ti, y, x):
        return jax.lax.dynamic_slice(ti, (y, x, 0), (h - crop, w - crop, c))

    return jax.vmap(one)(t, yo, xo)


def equivariance_loss(key: jax.Array, encode_fn, mel_spec: jnp.ndarray,
                      latents: jnp.ndarray,
                      config: EquivarianceLossConfig = EquivarianceLossConfig()
                      ) -> jnp.ndarray:
    """Latent shift-equivariance loss (reference: loss/equivariance.py:63-101):
    crop the mel spec by per-sample offsets in [1, crop_range], re-encode, and
    L1-compare against the ORIGINAL latents kaiser-filter-upsampled, cropped
    at the same offsets, and filter-downsampled back (so the target is the
    sub-latent-pixel shifted latent). The re-encoded latents are
    re-standardized to the target's mean/std with their own statistics
    detached, exactly as the reference does.

    mel_spec (B, F, T, C) channel-last; latents (B, F/2**(levels-1), ..., C').
    encode_fn: cropped mel -> latents (trainable path). Returns (B,) losses.
    """
    from ..models.layers import (filtered_downsample_2d, filtered_upsample_2d)
    cfg = config
    b = mel_spec.shape[0]
    cr = cfg.crop_range
    ky, kx = jax.random.split(key)
    yo = jax.random.randint(ky, (b,), 1, cr + 1)
    xo = jax.random.randint(kx, (b,), 1, cr + 1)

    mel_c = _crop_per_sample(mel_spec, yo, xo, cr)

    up = latents
    for _ in range(cfg.levels - 1):
        up = filtered_upsample_2d(up, cfg.filter_k_size * 2 + cfg.filter_k_size % 2,
                                  cfg.filter_beta)
    lat_c = _crop_per_sample(up, yo, xo, cr)
    down = lat_c
    for _ in range(cfg.levels - 1):
        down = filtered_downsample_2d(down, cfg.filter_k_size, cfg.filter_beta)
    down = jax.lax.stop_gradient(down)

    lat2 = encode_fn(mel_c).astype(jnp.float32)
    ax = (1, 2, 3)
    s2 = jax.lax.stop_gradient(lat2.std(axis=ax, keepdims=True))
    m2 = jax.lax.stop_gradient(lat2.mean(axis=ax, keepdims=True))
    lat2 = (lat2 / s2 * down.std(axis=ax, keepdims=True)
            - m2 + down.mean(axis=ax, keepdims=True))
    return jnp.abs(lat2 - down).mean(axis=ax)


# ---------------------------------------------------------------------------
# prime-width 1D MSS (the m1 trainer's raw/MDCT-domain variant)
# ---------------------------------------------------------------------------

PRIME_BLOCK_WIDTHS_1D = (31, 53, 83, 137, 223, 359, 577, 937, 1511, 2447,
                         3967, 6397)
PRIME_BLOCK_STEPS_1D = (7, 11, 17, 29, 47, 79, 127, 211, 337, 547, 887, 1433)


@functools.lru_cache(maxsize=32)
def _flat_top_window_1d(n: int) -> np.ndarray:
    """Periodic flat-top window on (k+0.5)/n, RMS-normalized
    (reference: dae_trainer_m1.py:159-167)."""
    x = (np.arange(n) + 0.5) / n * 2.0 * np.pi
    w = (0.21557895 - 0.41663158 * np.cos(x) + 0.277263158 * np.cos(2 * x)
         - 0.083578947 * np.cos(3 * x) + 0.006947368 * np.cos(4 * x))
    return (w / np.sqrt(np.mean(w ** 2))).astype(np.float32)


def prime_mss_1d(sample: jnp.ndarray, target: jnp.ndarray,
                 block_widths: Tuple[int, ...] = PRIME_BLOCK_WIDTHS_1D,
                 block_steps: Tuple[int, ...] = PRIME_BLOCK_STEPS_1D
                 ) -> jnp.ndarray:
    """Prime-width 1D multi-scale spectral loss on raw/MDCT-domain signals
    (reference: dae_trainer_m1.py:136-208): for each prime (width, step)
    pair, unfold -> RMS-normed flat-top window -> 2D ortho FFT over
    (block-index, within-block) -> target-energy-normalized MSE on
    magnitudes, per-frequency-bin weighting sqrt(bw)/rms(target).

    sample/target: (B, C, T). Returns per-sample (B,) losses.
    """
    from ..ops.stft import frame_signal
    pad = block_widths[-1] // 2
    pads = [(0, 0)] * (sample.ndim - 1) + [(pad, pad)]
    s = jnp.pad(sample.astype(jnp.float32), pads, mode="reflect")
    t = jax.lax.stop_gradient(
        jnp.pad(target.astype(jnp.float32), pads, mode="reflect"))

    loss = jnp.zeros((target.shape[0],), jnp.float32)
    for bw, step in zip(block_widths, block_steps):
        win = jnp.asarray(_flat_top_window_1d(bw))

        def fft2_abs(x):
            blocks = frame_signal(x, bw, step) * win        # (B, C, nB, bw)
            f = jnp.fft.rfft2(blocks, norm="ortho")
            return jnp.abs(f)

        t_abs = jax.lax.stop_gradient(fft2_abs(t))
        s_abs = fft2_abs(s)
        w = bw / jnp.sqrt(jnp.clip(jnp.mean(t_abs ** 2, axis=(0, 1, 2),
                                            keepdims=True), min=1e-5))
        w = jax.lax.stop_gradient(w)
        mse = (s_abs - t_abs) ** 2
        loss = loss + jnp.mean(mse * w, axis=(1, 2, 3))
    return loss
