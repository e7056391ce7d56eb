"""Golden tests for the DSP core against torch (CPU) reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualdiffusion_tpu.ops import (frame_signal, overlap_add, stft, istft,
                                   get_window)
from dualdiffusion_tpu.ops import fft as ddfft

torch = pytest.importorskip("torch")


def test_frame_overlap_roundtrip(rng):
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    frames = frame_signal(jnp.asarray(x), 256, 64)
    assert frames.shape == (2, 13, 256)
    np.testing.assert_allclose(np.asarray(frames)[0, 0], x[0, :256], atol=0)
    np.testing.assert_allclose(np.asarray(frames)[0, 3], x[0, 192:448], atol=0)
    # OLA of disjoint frames (hop == frame length) reproduces the signal
    f2 = frame_signal(jnp.asarray(x), 256, 256)
    y = overlap_add(f2, 256)
    np.testing.assert_allclose(np.asarray(y), x, atol=0)


@pytest.mark.parametrize("normalized", [False, True])
@pytest.mark.parametrize("win_exp", [1.0, 32.0])
def test_stft_matches_torch(rng, normalized, win_exp):
    n_fft, hop = 256, 64
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    win = get_window("hann_power", n_fft, exponent=win_exp)
    ours = np.asarray(stft(jnp.asarray(x), win, n_fft, hop,
                           normalized=normalized, backend="fft"))
    ref = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                     win_length=n_fft, window=torch.from_numpy(win).float(),
                     center=True, pad_mode="reflect", normalized=normalized,
                     onesided=True, return_complex=True).numpy()
    # ours: (..., frames, bins); torch: (..., bins, frames)
    np.testing.assert_allclose(ours, np.swapaxes(ref, -1, -2),
                               rtol=1e-4, atol=1e-4)


def test_istft_matches_torch(rng):
    n_fft, hop = 256, 64
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    win = get_window("hann", n_fft)
    spec_t = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                        window=torch.from_numpy(win).float(), center=True,
                        pad_mode="reflect", onesided=True, return_complex=True)
    ref = torch.istft(spec_t, n_fft=n_fft, hop_length=hop,
                      window=torch.from_numpy(win).float()).numpy()
    ours = np.asarray(istft(jnp.swapaxes(jnp.asarray(spec_t.numpy()), -1, -2),
                            win, n_fft, hop, backend="fft"))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_stft_istft_roundtrip_hann32(rng):
    """The project's tuned window: hann**32, 25x overlap."""
    n_fft, hop = 800, 32
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    win = get_window("hann_power", n_fft, exponent=32.0)
    spec = stft(jnp.asarray(x), win, n_fft, hop, backend="fft")
    y = np.asarray(istft(spec, win, n_fft, hop, length=4096, backend="fft"))
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n", [256, 640, 1024, 6400])
def test_rfft_matmul_backend(rng, n):
    x = jnp.asarray(rng.standard_normal((4, n)).astype(np.float32))
    ref = np.fft.rfft(np.asarray(x))
    got = np.asarray(ddfft.rfft(x, backend="matmul"))
    np.testing.assert_allclose(got.real, ref.real, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(got.imag, ref.imag, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("n", [256, 640, 1024, 6400])
def test_irfft_matmul_backend(rng, n):
    spec = rng.standard_normal((3, n // 2 + 1)) + 1j * rng.standard_normal((3, n // 2 + 1))
    spec = spec.astype(np.complex64)
    ref = np.fft.irfft(spec, n=n)
    got = np.asarray(ddfft.irfft(jnp.asarray(spec), n=n, backend="matmul"))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_windows_match_torch():
    for wl in (256, 511):
        np.testing.assert_allclose(get_window("hann", wl),
                                   torch.hann_window(wl).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        get_window("kaiser", 256, beta=4 * np.pi),
        torch.kaiser_window(256, beta=4 * np.pi, periodic=False).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        get_window("kaiser", 128, beta=12.0, periodic=True),
        torch.kaiser_window(128, beta=12.0, periodic=True).numpy(),
        rtol=1e-5, atol=1e-6)


def test_stft_istft_pair_match_complex(rng):
    import jax.numpy as jnp
    from dualdiffusion_tpu.ops import stft, istft, stft_pair, istft_pair
    from dualdiffusion_tpu.ops.windows import get_window
    win = get_window("hann", 512, periodic=True)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype("float32"))
    sp = stft(x, win, 512, 128)
    pr, pi = stft_pair(x, win, 512, 128)
    np.testing.assert_allclose(np.asarray(jnp.real(sp)), np.asarray(pr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.imag(sp)), np.asarray(pi), atol=1e-4)
    y1 = istft(sp, win, 512, 128)
    y2 = istft_pair(pr, pi, win, 512, 128)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
