"""Unit-RMS preservation tests for the magnitude-preserving toolkit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.models import mp
from dualdiffusion_tpu.models.layers import (MPConv, MPFourier,
                                             AdaptiveGroupBalance,
                                             FilteredDownsample2D,
                                             filtered_upsample_2d,
                                             filtered_downsample_2d)


def rms(x):
    return float(jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32)))))


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_normalize_unit_rms(key):
    x = jax.random.normal(key, (4, 8, 8, 16)) * 3.7
    y = mp.normalize(x)
    per_sample_rms = jnp.sqrt(jnp.mean(y.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
    np.testing.assert_allclose(np.asarray(per_sample_rms), 1.0, atol=1e-3)


def test_normalize_matches_reference_formula(key):
    """x / (eps + ||x||*sqrt(norm_numel/x_numel)) == x / (eps + rms)."""
    x = np.asarray(jax.random.normal(key, (2, 5, 7)))
    got = np.asarray(mp.normalize(jnp.asarray(x), eps=1e-2))
    n = 5 * 7
    norm = np.linalg.norm(x.reshape(2, -1), axis=1)
    ref = x / (1e-2 + norm / np.sqrt(n))[:, None, None]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mp_silu_preserves_rms(key):
    x = jax.random.normal(key, (1 << 16,))
    assert abs(rms(mp.mp_silu(x)) - 1.0) < 0.01


@pytest.mark.parametrize("t", [0.3, 0.5, 0.7])
def test_mp_sum_preserves_rms(key, t):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (1 << 16,))
    b = jax.random.normal(kb, (1 << 16,))
    assert abs(rms(mp.mp_sum(a, b, t)) - 1.0) < 0.01


def test_mp_cat_preserves_rms(key):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (64, 128)) * 1.0
    b = jax.random.normal(kb, (64, 384))
    y = mp.mp_cat(a, b, axis=-1, t=0.5)
    assert y.shape == (64, 512)
    assert abs(rms(y) - 1.0) < 0.02


def test_mp_cat_interleave(key):
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (4, 8))
    b = jax.random.normal(kb, (4, 8))
    y = mp.mp_cat_interleave(a, b, axis=-1)
    assert y.shape == (4, 16)
    # even positions from a, odd from b (up to the mp scaling)
    ratio = np.asarray(y[:, 0] / a[:, 0])
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-5)


def test_resample_2d_roundtrip(key):
    x = jax.random.normal(key, (2, 8, 8, 3))
    up = mp.resample_2d(x, "up")
    assert up.shape == (2, 16, 16, 3)
    down = mp.resample_2d(up, "down")
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-6)


def test_patchify_roundtrip(key):
    x = jax.random.normal(key, (2, 8, 12, 3))
    p = mp.patchify_2d(x, 2, 4)
    assert p.shape == (2, 4, 3, 24)
    y = mp.unpatchify_2d(p, 2, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)


def test_space_to_channel_3d_roundtrip(key):
    x = jax.random.normal(key, (2, 2, 8, 8, 4))
    y = mp.space_to_channel_3d(x)
    assert y.shape == (2, 2, 4, 4, 16)
    z = mp.channel_to_space_3d(y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=0)


def test_midside_involution(key):
    x = jax.random.normal(key, (2, 2, 8, 8))
    y = mp.midside_transform(mp.midside_transform(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_wavelet_roundtrip(key):
    x = jax.random.normal(key, (1, 16, 16, 2))
    w = mp.wavelet_decompose_2d(x, num_levels=3)
    assert len(w) == 3
    y = mp.wavelet_recompose_2d(w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_lowpass_2d(key):
    x = jax.random.normal(key, (1, 32, 32, 1))
    y = mp.lowpass_2d(x, blur_width=8.0)
    assert y.shape == x.shape
    # low-passed signal has less energy
    assert rms(y) < rms(x)


def test_randn_hp_2d(key):
    x = jnp.zeros((2, 32, 32, 4))
    n = mp.randn_like_hp_2d(key, x)
    assert n.shape == x.shape and bool(jnp.isfinite(n).all())


def test_random_crop_2d(key):
    x = jnp.arange(2 * 16 * 16 * 1, dtype=jnp.float32).reshape(2, 16, 16, 1)
    (y,) = mp.random_crop_2d(key, x, range_h=4, range_w=4, dropout=0.0)
    assert y.shape == (2, 12, 12, 1)


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def test_mpconv_linear_preserves_rms(key):
    m = MPConv(256, 256, kernel=())
    x = jax.random.normal(key, (64, 256))
    params = m.init(key, x)
    # after forced normalization, eval forward preserves RMS
    y = m.apply(params, x, training=True)
    assert abs(rms(y) - 1.0) < 0.1


def test_mpconv_2d_shapes_and_rms(key):
    m = MPConv(16, 32, kernel=(3, 3))
    x = jax.random.normal(key, (2, 16, 16, 16))
    params = m.init(key, x)
    y = m.apply(params, x, training=True)
    assert y.shape == (2, 16, 16, 32)
    assert abs(rms(y) - 1.0) < 0.15  # edge effects


def test_mpconv_3d_stereo_wrap(key):
    m = MPConv(8, 8, kernel=(2, 1, 1))
    x = jax.random.normal(key, (1, 2, 4, 4, 8))
    params = m.init(key, x)
    y = m.apply(params, x, training=True)
    assert y.shape == (1, 2, 4, 4, 8)
    # z-wraparound: rolling the stereo dim rolls the output
    y2 = m.apply(params, jnp.roll(x, 1, axis=1), training=True)
    np.testing.assert_allclose(np.asarray(jnp.roll(y, 1, axis=1)),
                               np.asarray(y2), atol=1e-5)


def test_mpconv_gain_scalar_and_per_sample(key):
    m = MPConv(8, 8, kernel=(1, 1))
    x = jax.random.normal(key, (2, 4, 4, 8))
    params = m.init(key, x)
    y1 = m.apply(params, x, gain=2.0)
    y0 = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), 2 * np.asarray(y0), rtol=1e-5)
    g = jnp.array([1.0, 3.0])
    yg = m.apply(params, x, gain=g)
    np.testing.assert_allclose(np.asarray(yg[1]), 3 * np.asarray(y0[1]), rtol=1e-5)


def test_mpconv_stride(key):
    m = MPConv(4, 8, kernel=(3, 3), stride=2)
    x = jax.random.normal(key, (1, 16, 16, 4))
    params = m.init(key, x)
    y = m.apply(params, x)
    assert y.shape == (1, 8, 8, 8)


def test_mpfourier(key):
    m = MPFourier(64)
    x = jnp.linspace(-2, 2, 128)
    params = m.init(key, x)  # stateless: no params
    y = m.apply(params, x)
    assert y.shape == (128, 64)
    # approximately unit RMS over channels
    assert abs(rms(y) - 1.0) < 0.25


def test_adaptive_group_balance(key):
    m = AdaptiveGroupBalance(emb_channels=16, groups=4)
    x = jax.random.normal(key, (2, 8, 8, 32))
    y = jax.random.normal(jax.random.split(key)[0], (2, 8, 8, 32))
    emb = jax.random.normal(key, (2, 16))
    params = m.init(key, x, y, emb)
    out = m.apply(params, x, y, emb)
    assert out.shape == x.shape
    # zero-init balance weights -> sigmoid(0)=0.5 clipped -> plain mp_sum
    np.testing.assert_allclose(np.asarray(out), np.asarray(mp.mp_sum(x, y, 0.5)),
                               rtol=1e-4, atol=1e-5)


def test_filtered_resample_roundtrip(key):
    x = jax.random.normal(key, (1, 16, 16, 2))
    up = filtered_upsample_2d(x, factor=2)
    assert up.shape == (1, 32, 32, 2)
    down = filtered_downsample_2d(up, factor=2)
    assert down.shape == (1, 16, 16, 2)
    # low-frequency content survives the roundtrip
    sm = mp.lowpass_2d(x, blur_width=8.0)
    sm2 = mp.lowpass_2d(down, blur_width=8.0)
    err = rms(sm - sm2) / rms(sm)
    assert err < 0.35


def test_filtered_downsample_module(key):
    m = FilteredDownsample2D(kernel=16, stride=8)
    x = jax.random.normal(key, (1, 64, 64, 3))
    params = m.init(key, x)
    y = m.apply(params, x)
    assert y.shape == (1, 8, 8, 3)


@pytest.mark.slow
def test_grouped_conv_matches_lax_conv(rng):
    """The per-tap batched-matmul grouped conv path must equal
    lax.conv_general_dilated(feature_group_count) exactly."""
    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.layers import MPConv

    def lax_ref(x, w, groups, stride, kernel):
        nd = len(kernel)
        if nd == 2:
            kh, kw = kernel
            rhs = jnp.transpose(w, (2, 3, 1, 0))
            dn = jax.lax.conv_dimension_numbers(x.shape, rhs.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, rhs, (stride, stride), [(kh // 2, kh // 2),
                                           (kw // 2, kw // 2)],
                dimension_numbers=dn, feature_group_count=groups)
        kz, kh, kw = kernel
        if kz == 2:
            x = jnp.concatenate([x, x[:, 0:1]], axis=1)
            pad_z = (0, 0)
        elif kz == 3:
            pad_z = (1, 1)
        else:
            pad_z = (0, 0)
        rhs = jnp.transpose(w, (2, 3, 4, 1, 0))
        dn = jax.lax.conv_dimension_numbers(x.shape, rhs.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            x, rhs, (1, stride, stride),
            [pad_z, (kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=dn, feature_group_count=groups)

    cases = [((3, 3), (2, 8, 12, 16), 4, 1),
             ((3, 3), (2, 8, 12, 16), 4, 2),
             ((1, 1), (2, 8, 12, 16), 8, 1),
             ((2, 3, 3), (2, 2, 8, 12, 16), 4, 1),
             ((3, 3, 3), (2, 3, 8, 12, 16), 4, 1)]
    for kernel, xshape, groups, stride in cases:
        ci, co = xshape[-1], 24
        x = jnp.asarray(rng.standard_normal(xshape).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(
            (co, ci // groups) + kernel).astype(np.float32))
        conv = MPConv(ci, co, kernel, groups=groups, stride=stride)
        got = conv._grouped_conv(x, w)
        want = lax_ref(x, w, groups, stride, kernel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5), (kernel, stride)


def test_grouped_packed_conv_matches(rng, monkeypatch):
    """DD_GROUPED_PACKED_CONV=1 (per-group W-packed dense convs — the
    round-4 sampler lowering candidate) must equal the per-tap grouped
    path / lax feature_group_count exactly, across pack factors (cig 16 ->
    p=8, 32 -> p=4, 128 -> p=1 dense-per-group) and non-divisible widths
    (p reduced until W % p == 0)."""
    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.layers import MPConv

    cases = [  # (C_in, C_out, groups, W)
        (128, 256, 8, 12),    # cig 16, p 8 -> reduced to 4 (12 % 8 != 0)
        (256, 512, 8, 16),    # cig 32, p 4
        (512, 256, 8, 16),    # cig 64, p 2
        (512, 512, 4, 10),    # cig 128, p 1 (dense per group)
        (96, 96, 3, 14),      # cig 32, p 4 -> reduced to 2
    ]
    for ci, co, g, w_dim in cases:
        x = jnp.asarray(rng.standard_normal((2, 6, w_dim, ci)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(
            (co, ci // g, 3, 3)).astype(np.float32))
        conv = MPConv(ci, co, (3, 3), groups=g)
        want = conv._grouped_conv(x, w)
        got = conv._grouped_packed_conv(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-4)

    # mode 2: every group in ONE W-packed native grouped conv
    for ci, co, g, w_dim in [(256, 512, 8, 16), (512, 256, 8, 16),
                             (96, 96, 3, 14)]:
        x = jnp.asarray(rng.standard_normal((2, 6, w_dim, ci)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(
            (co, ci // g, 3, 3)).astype(np.float32))
        conv = MPConv(ci, co, (3, 3), groups=g)
        want = conv._grouped_conv(x, w)
        p = 128 // (ci // g)
        while p > 1 and w_dim % p:
            p //= 2
        got = conv._grouped_packed_fused(x, w, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-4)

    # env routing: __call__ dispatches to the packed paths when enabled
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 4, 8, 64))
    conv = MPConv(64, 64, (3, 3), groups=8)
    v = conv.init(key, x)
    monkeypatch.setenv("DD_GROUPED_PACKED_CONV", "0")
    base = conv.apply(v, x)
    for mode in ("1", "2"):
        monkeypatch.setenv("DD_GROUPED_PACKED_CONV", mode)
        enabled = conv.apply(v, x)
        np.testing.assert_allclose(np.asarray(enabled), np.asarray(base),
                                   rtol=2e-5, atol=1e-4)


def test_grouped_conv_chain_layout(rng):
    """grouped_out -> grouped_in chaining matches two merged-NHWC grouped
    convs exactly (the batch-major layout is a pure relayout)."""
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.layers import MPConv

    for kernel, xshape in [((3, 3), (2, 8, 12, 16)),
                           ((3, 3, 3), (2, 3, 8, 12, 16))]:
        g, cmid, co = 4, 32, 16
        ci = xshape[-1]
        x = jnp.asarray(rng.standard_normal(xshape).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal(
            (cmid, ci // g) + kernel).astype(np.float32))
        w2 = jnp.asarray(rng.standard_normal(
            (co, cmid // g) + kernel).astype(np.float32))
        c1 = MPConv(ci, cmid, kernel, groups=g)
        c2 = MPConv(cmid, co, kernel, groups=g)
        want = c2._grouped_conv(c1._grouped_conv(x, w1), w2)
        mid = c1._grouped_conv(x, w1, grouped_out=True)
        got = c2._grouped_conv(mid, w2, grouped_in=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_filtered_downsample_3d_shape(key):
    """5-D (B, Z, H, W, C) input filters each z-plane independently
    (reference mp_tools.py use_3d_shape variant)."""
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.layers import FilteredDownsample2D

    m = FilteredDownsample2D(kernel=8, stride=4)
    x5 = jax.random.normal(key, (2, 2, 16, 16, 3))
    params = m.init(key, x5)
    y5 = m.apply(params, x5)
    assert y5.shape == (2, 2, 4, 4, 3)
    # equals applying the 4-D op per z-plane
    y_pl = jnp.stack([m.apply(params, x5[:, z]) for z in range(2)], axis=1)
    np.testing.assert_allclose(np.asarray(y5), np.asarray(y_pl), atol=1e-6)
