"""Core utilities: audio io, loudness normalization, safetensors io, tensor
visualisation, and misc numeric helpers.

Capability parity with the reference's utility layer
(reference: src/utils/dual_diffusion_utils.py:236-786), rebuilt on
numpy/scipy/jax with no torch dependency:

  * ``load_audio`` / ``save_audio`` — WAV natively (scipy), FLAC via an
    external ``flac``/``ffmpeg`` binary when present (gated).
  * ``get_audio_loudness`` / ``normalize_lufs`` — ITU-R BS.1770-4 integrated
    loudness (K-weighting + absolute/relative gating), replacing pyloudnorm.
  * ``load_safetensors`` / ``save_safetensors`` — numpy-backed with atomic
    copy-on-write writes (reference: src/utils/dual_diffusion_utils.py:430-496).
  * ``tensor_to_img`` — spectrogram/latent visualisation with the roseus
    colormap.
  * ``quantize_tensor``/``dequantize_tensor``, ``mu_law``, ``slerp``,
    ``fractal_noise_2d`` misc helpers
    (reference: src/utils/dual_diffusion_utils.py:553-770).
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# audio io
# ---------------------------------------------------------------------------

def load_audio(path: Union[str, Path], start: int = 0, count: int = -1,
               return_sample_rate: bool = False):
    """Load audio as float32 numpy array of shape (channels, samples)."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        from scipy.io import wavfile
        sr, data = wavfile.read(str(path))
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 1:
            data = data[:, None]
        data = data.T  # (channels, samples)
    elif suffix == ".flac":
        data, sr = _load_flac(path)
    else:
        raise ValueError(f"unsupported audio format: {suffix}")
    if start > 0 or count >= 0:
        end = start + count if count >= 0 else data.shape[-1]
        data = data[:, start:end]
    if return_sample_rate:
        return data, sr
    return data


def _flac_binary() -> Optional[str]:
    for name in ("flac", "ffmpeg"):
        b = shutil.which(name)
        if b:
            return b
    return None


def _load_flac(path: Path) -> Tuple[np.ndarray, int]:
    binary = _flac_binary()
    if binary is None:
        raise RuntimeError(
            "FLAC decoding requires the 'flac' or 'ffmpeg' binary on PATH "
            "(neither soundfile nor a codec CLI is available in this env)")
    with tempfile.TemporaryDirectory() as tmp:
        wav = Path(tmp) / "out.wav"
        if binary.endswith("ffmpeg"):
            cmd = [binary, "-y", "-i", str(path), str(wav)]
        else:
            cmd = [binary, "-d", "-f", "-o", str(wav), str(path)]
        subprocess.run(cmd, check=True, capture_output=True)
        return load_audio(wav, return_sample_rate=True)  # type: ignore[return-value]


def save_audio(audio: np.ndarray, sample_rate: int, path: Union[str, Path],
               target_lufs: Optional[float] = None) -> None:
    """Save (channels, samples) float audio. WAV natively; FLAC via CLI."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    if target_lufs is not None:
        audio = normalize_lufs(audio, sample_rate, target_lufs)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    from scipy.io import wavfile
    pcm = np.clip(audio.T, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype(np.int16)
    if path.suffix.lower() == ".wav":
        wavfile.write(str(path), sample_rate, pcm16)
        return
    if path.suffix.lower() == ".flac":
        binary = _flac_binary()
        if binary is None:
            wav_path = path.with_suffix(".wav")
            logger.warning("no flac encoder available; wrote %s instead", wav_path)
            wavfile.write(str(wav_path), sample_rate, pcm16)
            return
        with tempfile.TemporaryDirectory() as tmp:
            wav = Path(tmp) / "in.wav"
            wavfile.write(str(wav), sample_rate, pcm16)
            if binary.endswith("ffmpeg"):
                cmd = [binary, "-y", "-i", str(wav), str(path)]
            else:
                cmd = [binary, "-f", "-o", str(path), str(wav)]
            subprocess.run(cmd, check=True, capture_output=True)
        return
    raise ValueError(f"unsupported audio format: {path.suffix}")


# ---------------------------------------------------------------------------
# loudness (ITU-R BS.1770-4) — replaces pyloudnorm
# ---------------------------------------------------------------------------

def _k_weighting_coeffs(sr: float):
    """Pre-filter (shelving) + RLB high-pass biquads per BS.1770-4 annex 1."""
    # stage 1: high-shelf
    f0, G, Q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    K = np.tan(np.pi * f0 / sr)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b_shelf = np.array([(Vh + Vb * K / Q + K * K) / a0,
                        2.0 * (K * K - Vh) / a0,
                        (Vh - Vb * K / Q + K * K) / a0])
    a_shelf = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0])
    # stage 2: high-pass
    f0, Q = 38.13547087602444, 0.5003270373238773
    K = np.tan(np.pi * f0 / sr)
    a_hp = np.array([1.0, 2.0 * (K * K - 1.0) / (1.0 + K / Q + K * K),
                     (1.0 - K / Q + K * K) / (1.0 + K / Q + K * K)])
    b_hp = np.array([1.0, -2.0, 1.0])
    return (b_shelf, a_shelf), (b_hp, a_hp)


def get_audio_loudness(audio: np.ndarray, sample_rate: int) -> float:
    """Integrated loudness (LUFS) of (channels, samples) audio, BS.1770-4."""
    from scipy.signal import lfilter
    audio = np.atleast_2d(np.asarray(audio, dtype=np.float64))
    (b1, a1), (b2, a2) = _k_weighting_coeffs(sample_rate)
    y = lfilter(b2, a2, lfilter(b1, a1, audio, axis=-1), axis=-1)
    # gated blocks: 400ms, 75% overlap
    block = int(round(0.4 * sample_rate))
    step = max(1, int(round(0.1 * sample_rate)))
    n = y.shape[-1]
    if n < block:
        z = np.mean(y ** 2, axis=-1).sum()
        return float(-0.691 + 10.0 * np.log10(max(z, 1e-12)))
    starts = np.arange(0, n - block + 1, step)
    # power per block per channel
    sq = y ** 2
    csum = np.concatenate([np.zeros((y.shape[0], 1)), np.cumsum(sq, axis=-1)], axis=-1)
    zblk = (csum[:, starts + block] - csum[:, starts]) / block  # (C, B)
    zsum = zblk.sum(axis=0)  # channel weights 1.0 for L/R
    lblk = -0.691 + 10.0 * np.log10(np.maximum(zsum, 1e-12))
    mask = lblk > -70.0  # absolute gate
    if not mask.any():
        return -70.0
    rel_thresh = -0.691 + 10.0 * np.log10(np.maximum(zsum[mask].mean(), 1e-12)) - 10.0
    mask &= lblk > rel_thresh
    if not mask.any():
        return -70.0
    return float(-0.691 + 10.0 * np.log10(np.maximum(zsum[mask].mean(), 1e-12)))


def normalize_lufs(audio: np.ndarray, sample_rate: int,
                   target_lufs: float = -20.0, max_clip: float = 0.15) -> np.ndarray:
    """Gain audio to target integrated loudness; limit clipping overshoot.

    Reference semantics: src/utils/dual_diffusion_utils.py:236-258.
    """
    loudness = get_audio_loudness(audio, sample_rate)
    gain = 10.0 ** ((target_lufs - loudness) / 20.0)
    out = np.asarray(audio, dtype=np.float32) * gain
    peak = np.abs(out).max() if out.size else 0.0
    limit = 1.0 + max_clip
    if peak > limit:
        out = out * (limit / peak)
    return out


# ---------------------------------------------------------------------------
# safetensors io (numpy-backed, atomic writes)
# ---------------------------------------------------------------------------

def load_safetensors(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(str(path))


def load_safetensors_metadata(path: Union[str, Path]) -> Dict[str, str]:
    from safetensors import safe_open
    with safe_open(str(path), framework="numpy") as f:
        return dict(f.metadata() or {})


def save_safetensors(tensors: Dict[str, np.ndarray], path: Union[str, Path],
                     metadata: Optional[Dict[str, str]] = None) -> None:
    """Atomic safetensors write (copy-on-write temp + rename).

    Reference semantics: src/utils/dual_diffusion_utils.py:444-496.
    """
    from safetensors.numpy import save_file
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    os.close(fd)
    try:
        save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
                  tmp, metadata=metadata)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


# ---------------------------------------------------------------------------
# visualisation
# ---------------------------------------------------------------------------

def tensor_to_img(x, flip_y: bool = True, colormap: bool = True) -> np.ndarray:
    """Map a 2D/3D tensor to a uint8 image (H, W, 3) for previews.

    Multi-channel inputs are tiled vertically. Reference semantics:
    src/utils/dual_diffusion_utils.py (tensor_to_img).
    """
    x = np.asarray(x, dtype=np.float32)
    while x.ndim > 3:
        x = x.reshape((-1,) + x.shape[-2:]) if x.shape[0] != 1 else x[0]
    if x.ndim == 3:
        x = np.concatenate(list(x), axis=0)
    lo, hi = np.nanmin(x), np.nanmax(x)
    x = (x - lo) / (hi - lo + 1e-8)
    if flip_y:
        x = x[::-1]
    if colormap:
        from .roseus import ROSEUS_LUT
        idx = np.clip((x * 255.0).astype(np.int32), 0, 255)
        return (ROSEUS_LUT[idx] * 255.0).astype(np.uint8)
    g = (x * 255.0).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def save_img(img: np.ndarray, path: Union[str, Path]) -> None:
    from PIL import Image
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).save(str(path))


# ---------------------------------------------------------------------------
# misc numeric helpers
# ---------------------------------------------------------------------------

def quantize_tensor(x: np.ndarray, num_levels: int = 256):
    """Uniform per-tensor quantization -> (uint8/uint16 codes, scale, offset).

    Reference semantics: src/utils/dual_diffusion_utils.py:553-570.
    """
    lo, hi = float(np.min(x)), float(np.max(x))
    scale = (hi - lo) / max(num_levels - 1, 1) or 1.0
    codes = np.round((x - lo) / scale).astype(np.uint8 if num_levels <= 256 else np.uint16)
    return codes, np.float32(scale), np.float32(lo)


def dequantize_tensor(codes: np.ndarray, scale, offset) -> np.ndarray:
    return codes.astype(np.float32) * np.float32(scale) + np.float32(offset)


def mu_law_encode(x: np.ndarray, mu: float = 255.0) -> np.ndarray:
    return np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)


def mu_law_decode(y: np.ndarray, mu: float = 255.0) -> np.ndarray:
    return np.sign(y) * (np.expm1(np.abs(y) * np.log1p(mu))) / mu


def cos_angle(a: np.ndarray, b: np.ndarray) -> float:
    na = np.linalg.norm(a.ravel()) + 1e-12
    nb = np.linalg.norm(b.ravel()) + 1e-12
    return float(np.dot(a.ravel(), b.ravel()) / (na * nb))


def slerp(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    """Spherical interpolation between flattened tensors."""
    omega = np.arccos(np.clip(cos_angle(a, b), -1.0, 1.0))
    so = np.sin(omega)
    if so < 1e-6:
        return a * (1.0 - t) + b * t
    return (np.sin((1.0 - t) * omega) / so) * a + (np.sin(t * omega) / so) * b


def fractal_noise_2d(shape: Tuple[int, int], octaves: int = 6, persistence: float = 0.5,
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """1/f-style fractal noise via summed upsampled gaussian octaves."""
    rng = rng or np.random.default_rng()
    h, w = shape
    out = np.zeros(shape, dtype=np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh, gw = max(2, h >> (octaves - 1 - o)), max(2, w >> (octaves - 1 - o))
        g = rng.standard_normal((gh, gw)).astype(np.float32)
        ys = np.linspace(0, gh - 1, h)
        xs = np.linspace(0, gw - 1, w)
        y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, gh - 1); x1 = np.minimum(x0 + 1, gw - 1)
        fy = (ys - y0)[:, None]; fx = (xs - x0)[None, :]
        up = (g[np.ix_(y0, x0)] * (1 - fy) * (1 - fx) + g[np.ix_(y0, x1)] * (1 - fy) * fx
              + g[np.ix_(y1, x0)] * fy * (1 - fx) + g[np.ix_(y1, x1)] * fy * fx)
        out += amp * up
        total += amp
        amp *= persistence
    return out / total
