"""STFT / inverse STFT built from reshape-based framing and phase-sliced
overlap-add — no gathers or scatters, so XLA lowers everything to reshapes,
static slices and (through ops.fft) MXU matmuls.

Semantics are torch.stft/istft-compatible (center=True, reflect padding,
onesided) because the formats layer is golden-tested against the reference's
numbers (reference: src/modules/formats/old/spectrogram.py:108-121,
src/modules/formats/ms_mdct_dual_2.py:204-209).

Layout: spectra are (..., frames, bins) — frames in the sublane dim, bins in
the lane dim, matmul-friendly. The formats layer transposes to the
reference's (..., bins, frames) at its boundary.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(..., T) -> (..., F, frame_length) with F = (T - frame_length)//hop + 1.

    The signal is reshaped to hop-sized rows and each frame is
    P = ceil(frame_length/hop) consecutive rows (sliced to frame_length), so
    framing is P static slices + a stack (XLA-friendly; no gather).
    """
    p = -(-frame_length // hop_length)
    t = x.shape[-1]
    f = (t - frame_length) // hop_length + 1
    if f < 1:
        raise ValueError(f"signal too short to frame: {t} < {frame_length}")
    rows_needed = f - 1 + p
    pad_to = rows_needed * hop_length
    if pad_to > t:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad_to - t)])
    else:
        x = x[..., :pad_to]
    y = x.reshape(x.shape[:-1] + (rows_needed, hop_length))
    phases = [jax.lax.slice_in_dim(y, q, q + f, axis=-2) for q in range(p)]
    # concat along the LANE axis — never materialize a separate P axis.
    # (stack(axis=-2) + reshape put P in the minor tile pair, which XLA laid
    # out with 128x padding: 688 MB for a 5.4 MB slice at the flagship FGLA
    # size, seen in an HBM OOM dump on v5e.)
    frames = jnp.concatenate(phases, axis=-1)  # (..., F, P*hop)
    return frames[..., :frame_length]


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(..., F, L) -> (..., (F-1)*hop + L) via P static pads + adds."""
    f, l = frames.shape[-2], frames.shape[-1]
    out_len = (f - 1) * hop_length + l
    if l % hop_length != 0:  # zero-pad frames to a multiple of hop
        pad = hop_length - l % hop_length
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
        l += pad
    p = l // hop_length
    rows_out = f - 1 + p
    # slice hop-chunks off the LANE axis (tile-aligned when hop % 128 == 0)
    # instead of reshaping to (..., F, P, hop) — see frame_signal for the
    # pathological layout XLA picks when P lands in the minor tile pair
    out = jnp.zeros(frames.shape[:-2] + (rows_out, hop_length), frames.dtype)
    for q in range(p):
        chunk = jax.lax.slice_in_dim(frames, q * hop_length,
                                     (q + 1) * hop_length, axis=-1)
        pad = [(0, 0)] * (frames.ndim - 2) + [(q, rows_out - f - q), (0, 0)]
        out = out + jnp.pad(chunk, pad)
    out = out.reshape(out.shape[:-2] + (rows_out * hop_length,))
    return out[..., :out_len]


def _pad_center(window: np.ndarray, n_fft: int) -> np.ndarray:
    """Pad a win_length window symmetrically to n_fft (torch semantics)."""
    wl = window.shape[0]
    if wl == n_fft:
        return window
    left = (n_fft - wl) // 2
    return np.pad(window, (left, n_fft - wl - left))


def stft(x: jnp.ndarray, window: np.ndarray, n_fft: int, hop_length: int,
         center: bool = True, normalized: bool = False,
         backend: Optional[str] = None) -> jnp.ndarray:
    """torch.stft-compatible: (..., T) -> complex (..., frames, bins)."""
    win = _pad_center(np.asarray(window, np.float64), n_fft)
    if normalized:  # torch semantics: multiply by frame_length**-0.5
        win = win / np.sqrt(n_fft)
    if center:
        padw = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, padw, mode="reflect")
    frames = frame_signal(x, n_fft, hop_length)
    frames = frames * jnp.asarray(win, frames.dtype)
    return _fft.rfft(frames, n_fft, backend=backend)


def stft_pair(x: jnp.ndarray, window: np.ndarray, n_fft: int,
              hop_length: int, center: bool = True,
              backend: Optional[str] = None):
    """stft returning a (real, imag) pair — no complex64 packing pass.
    Used by the FGLA loop where both halves are consumed separately."""
    win = _pad_center(np.asarray(window, np.float64), n_fft)
    if center:
        padw = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, padw, mode="reflect")
    frames = frame_signal(x, n_fft, hop_length)
    frames = frames * jnp.asarray(win, frames.dtype)
    return _fft.rfft_pair(frames, n_fft, backend=backend)


def istft_pair(sp_r: jnp.ndarray, sp_i: jnp.ndarray, window: np.ndarray,
               n_fft: int, hop_length: int, center: bool = True,
               length: Optional[int] = None, backend: Optional[str] = None,
               envelope_eps: float = 1e-11) -> jnp.ndarray:
    """istft from a (real, imag) pair — no complex64 unpacking pass."""
    win = _pad_center(np.asarray(window, np.float64), n_fft)
    f = sp_r.shape[-2]
    frames = _fft.irfft_pair(sp_r, sp_i, n_fft, backend=backend)
    frames = frames * jnp.asarray(win, frames.dtype)
    sig = overlap_add(frames, hop_length)
    env_frames = np.broadcast_to(win ** 2, (f, n_fft))
    env = _overlap_add_np(env_frames, hop_length)
    env = np.maximum(env, envelope_eps).astype(np.float32)
    sig = sig / jnp.asarray(env, sig.dtype)
    if center:
        sig = sig[..., n_fft // 2: sig.shape[-1] - n_fft // 2]
    out_len = length if length is not None else (f - 1) * hop_length
    if sig.shape[-1] > out_len:
        sig = sig[..., :out_len]
    elif sig.shape[-1] < out_len:
        sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1)
                      + [(0, out_len - sig.shape[-1])])
    return sig


def istft(spec: jnp.ndarray, window: np.ndarray, n_fft: int, hop_length: int,
          center: bool = True, length: Optional[int] = None,
          normalized: bool = False, backend: Optional[str] = None,
          envelope_eps: float = 1e-11) -> jnp.ndarray:
    """torch.istft-compatible: complex (..., frames, bins) -> (..., T).

    Overlap-add of windowed irfft frames, normalized by the overlap-added
    squared window envelope (clamped at envelope_eps to stay finite where the
    hann**32-style windows underflow at frame edges).
    """
    win = _pad_center(np.asarray(window, np.float64), n_fft)
    if normalized:  # torch semantics: multiply by frame_length**-0.5
        win = win / np.sqrt(n_fft)
    f = spec.shape[-2]
    frames = _fft.irfft(spec, n_fft, backend=backend)
    frames = frames * jnp.asarray(win, frames.dtype)
    sig = overlap_add(frames, hop_length)
    # squared-window envelope, computed host-side (static shapes)
    env_frames = np.broadcast_to(win ** 2, (f, n_fft))
    env = _overlap_add_np(env_frames, hop_length)
    env = np.maximum(env, envelope_eps).astype(np.float32)
    sig = sig / jnp.asarray(env, sig.dtype)
    if center:
        sig = sig[..., n_fft // 2: sig.shape[-1] - n_fft // 2]
    out_len = length if length is not None else (f - 1) * hop_length
    if sig.shape[-1] > out_len:
        sig = sig[..., :out_len]
    elif sig.shape[-1] < out_len:
        sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1) + [(0, out_len - sig.shape[-1])])
    return sig


def _overlap_add_np(frames: np.ndarray, hop: int) -> np.ndarray:
    f, l = frames.shape
    out = np.zeros((f - 1) * hop + l, dtype=np.float64)
    for i in range(f):
        out[i * hop: i * hop + l] += frames[i]
    return out


def stft_num_frames(t: int, hop_length: int, center: bool = True,
                    n_fft: int = 0) -> int:
    if center:
        return t // hop_length + 1
    return (t - n_fft) // hop_length + 1
