import numpy as np
import pytest
import jax.numpy as jnp

from dualdiffusion_tpu.ops import mdct, imdct, mclt, imclt


def _mdct_direct(x: np.ndarray, window: np.ndarray) -> np.ndarray:
    """O(N^2) textbook MDCT of already-framed signal (F, L) -> (F, N).

    X[k] = s * sum_n x[n] w[n] cos(2*pi/L * (n + 0.5 + L/4) * (k + 0.5)),
    s = 1/sqrt(L * L/2) (the reference's scaling, functional.py:125-128).
    """
    L = window.shape[0]
    N = L // 2
    n = np.arange(L)[:, None]
    k = np.arange(N)[None, :]
    basis = np.cos(2 * np.pi / L * (n + 0.5 + L / 4) * (k + 0.5))
    return (x * window) @ basis / np.sqrt(L * N)


def test_mdct_matches_cosine_definition(rng):
    from dualdiffusion_tpu.ops.windows import sin_window
    from dualdiffusion_tpu.ops.stft import frame_signal
    L = 64
    x = rng.standard_normal((1, 512)).astype(np.float32)
    got = np.asarray(mdct(jnp.asarray(x), L))  # (1, N, F)
    # direct: replicate padding + framing, then cosine sum
    hop = L // 2
    t = x.shape[-1]
    n_frames = -(-t // hop) + 1
    xp = np.pad(x, [(0, 0), (hop, (n_frames + 1) * hop - t)], mode="reflect")
    frames = np.asarray(frame_signal(jnp.asarray(xp), L, hop))[:, :-1]
    ref = _mdct_direct(frames[0], sin_window(L))  # (F, N)
    np.testing.assert_allclose(got[0], ref.T, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("window_fn,atol", [
    ("sin_mdct", 1e-4),
    ("vorbis", 1e-4),
    # the mdct-zoo KBD uses an unsquared kaiser cumsum (matching the
    # reference's vendored construction, src/utils/mdct/windows.py:28-63)
    # which deviates from Princen-Bradley by ~1%, so reconstruction is
    # only approximate — for the reference implementation too.
    ("kbd_mdct", 5e-2),
])
def test_mdct_perfect_reconstruction(rng, window_fn, atol):
    x = rng.standard_normal((2, 2, 4096)).astype(np.float32)
    spec = mdct(jnp.asarray(x), 512, window_fn=window_fn)
    assert spec.shape[-2] == 256
    y = np.asarray(imdct(spec, 512, window_fn=window_fn))
    assert y.shape[-1] == x.shape[-1]
    np.testing.assert_allclose(y, x, rtol=1e-3, atol=atol)


def test_mdct_complex_psd_phase(rng):
    x = rng.standard_normal((1, 1, 4096)).astype(np.float32)
    re, im = mdct(jnp.asarray(x), 512, return_complex=True)
    mag = np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2)
    # complex MCLT magnitude bounds the real MDCT part
    assert (np.abs(np.asarray(re)) <= mag + 1e-5).all()
    # energy sanity: parseval-ish within a factor accounting for windowing
    assert mag.mean() > 0


def test_mclt_roundtrip(rng):
    # hann**0.5 satisfies Princen-Bradley (w^2 is COLA), so the analysis/
    # synthesis pair reconstructs; hann**1 does not (also true of the
    # reference's mclt/imclt pair — verified numerically against
    # src/utils/mclt.py:87-130 formulas).
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    re, im = mclt(jnp.asarray(x), 256, window_fn="hann", window_exponent=0.5)
    y = np.asarray(imclt(re, im, 256, window_fn="hann", window_exponent=0.5))
    n = min(y.shape[-1], x.shape[-1])
    np.testing.assert_allclose(y[..., :n], x[..., :n], rtol=1e-3, atol=1e-3)


def test_mclt_matches_reference_formula(rng):
    """Golden: forward MCLT == the published pre/post-twiddled FFT formula
    (reference: src/utils/mclt.py:87-110), evaluated here with torch.fft."""
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    re, im = mclt(jnp.asarray(x), 256, window_fn="hann", window_exponent=1.0)
    bw = 256
    xt = torch.nn.functional.pad(torch.from_numpy(x), (bw // 2, bw // 2),
                                 mode="reflect").unfold(-1, bw, bw // 2)
    N = bw // 2
    n = torch.arange(2 * N)
    k = torch.arange(0.5, N + 0.5)
    wdw = 0.5 - 0.5 * torch.cos(2 * torch.pi * torch.arange(2 * N) / (2 * N))
    pre = torch.exp(-1j * torch.pi / 2 / N * n)
    post = torch.exp(-1j * torch.pi / 2 / N * (N + 1) * k)
    ref = (torch.fft.fft(xt * pre * wdw, norm="forward")[..., :N]
           * post * (2 * N ** 0.5)).numpy()
    np.testing.assert_allclose(np.asarray(re), ref.real, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, rtol=1e-3, atol=1e-4)
