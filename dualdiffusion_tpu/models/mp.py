"""Magnitude-preserving primitive functions (the EDM2 MP toolkit).

Functional counterparts of the reference's mp_tools
(reference: src/modules/mp_tools.py:42-311), rebuilt for TPU:

  * channel-LAST layout everywhere: 2D activations are (B, H, W, C),
    stereo-folded 3D activations are (B, Z, H, W, C). NHWC is the native
    TPU conv layout (the reference gets the same physical layout via
    torch channels_last memory format).
  * the fp32/TF32-disabled internal precision of the reference's
    ``normalize`` (mp_tools.py:45-49) maps to explicit fp32 casts here —
    TPUs have no TF32; float32 ops are exact.

All functions are pure jnp and safe under jit/vmap/shard_map.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

# magnitude-preserving silu divisor: std of silu(x) for x ~ N(0,1)
# (EDM2 eq. 81; reference mp_tools.py:268-269)
_SILU_STD = 0.596


def normalize(x: jnp.ndarray, axis: Optional[Union[int, Sequence[int]]] = None,
              eps: float = 1e-4) -> jnp.ndarray:
    """Normalize to unit RMS over ``axis`` (default: all but axis 0) in fp32.

    Matches reference mp_tools.py:42-49: x / (eps + ||x|| / sqrt(n)).
    """
    if axis is None:
        axis = tuple(range(1, x.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    xf = x.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(jnp.square(xf), axis=axis, keepdims=True))
    return (xf / (eps + rms)).astype(x.dtype)


def normalize_groups(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Pixel-norm per channel group; channel-last (B, ..., C)."""
    if groups == 1:
        return normalize(x, axis=-1)
    c = x.shape[-1]
    y = x.reshape(x.shape[:-1] + (groups, c // groups))
    y = normalize(y, axis=-1)
    return y.reshape(x.shape)


def mp_silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x) / _SILU_STD


def mp_sum(a: jnp.ndarray, b: jnp.ndarray,
           t: Union[float, jnp.ndarray] = 0.5) -> jnp.ndarray:
    """lerp(a, b, t) / sqrt((1-t)^2 + t^2)  (EDM2 eq. 88)."""
    lerp = a + (b - a) * t
    denom = ((1.0 - t) ** 2 + t ** 2) ** 0.5
    return (lerp / denom).astype(a.dtype)


def mp_sum_groups(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray,
                  groups: int) -> jnp.ndarray:
    """Per-group mp_sum; t is (..., groups), channel-last activations."""
    c = a.shape[-1]
    sh = a.shape[:-1] + (groups, c // groups)
    ag = a.reshape(sh)
    bg = b.reshape(b.shape[:-1] + (groups, c // groups))
    while t.ndim < ag.ndim - 1:
        t = t[..., None, :] if t.ndim >= 2 else t[None]
    t = t[..., :, None]  # broadcast over the within-group channel dim
    out = mp_sum(ag, bg, t)
    return out.reshape(a.shape)


def mp_cat(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1,
           t: float = 0.5) -> jnp.ndarray:
    """Magnitude-preserving concat (EDM2 eq. 103)."""
    na, nb = a.shape[axis], b.shape[axis]
    c = ((na + nb) / ((1.0 - t) ** 2 + t ** 2)) ** 0.5
    wa = c / na ** 0.5 * (1.0 - t)
    wb = c / nb ** 0.5 * t
    return jnp.concatenate([wa * a, wb * b], axis=axis)


def mp_cat_interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1,
                      t: float = 0.5) -> jnp.ndarray:
    na, nb = a.shape[axis], b.shape[axis]
    c = ((na + nb) / ((1.0 - t) ** 2 + t ** 2)) ** 0.5
    wa = c / na ** 0.5 * (1.0 - t)
    wb = c / nb ** 0.5 * t
    axis = axis % a.ndim
    stacked = jnp.stack([wa * a, wb * b], axis=axis + 1)
    new_shape = list(a.shape)
    new_shape[axis] = na * 2
    return stacked.reshape(new_shape)


# ---------------------------------------------------------------------------
# resampling / patching (channel-last)
# ---------------------------------------------------------------------------

def resample_1d(x: jnp.ndarray, mode: str = "keep") -> jnp.ndarray:
    """(..., T, C): down = pairwise mean, up = nearest 2x (axis -2)."""
    if mode == "keep":
        return x
    if mode == "down":
        return 0.5 * (x[..., ::2, :] + x[..., 1::2, :])
    if mode == "up":
        return jnp.repeat(x, 2, axis=-2)
    raise ValueError(mode)


def resample_2d(x: jnp.ndarray, mode: str = "keep", ratio: int = 2) -> jnp.ndarray:
    """(..., H, W, C): down = ratio x ratio avg-pool (floor semantics like
    torch avg_pool2d: trailing remainder rows/cols dropped), up = nearest."""
    if mode == "keep":
        return x
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    if mode == "down":
        he, we = h // ratio * ratio, w // ratio * ratio
        if he != h or we != w:
            x = x[..., :he, :we, :]
        y = x.reshape(x.shape[:-3] + (he // ratio, ratio, we // ratio, ratio, c))
        return y.mean(axis=(-4, -2))
    if mode == "up":
        return jnp.repeat(jnp.repeat(x, ratio, axis=-3), ratio, axis=-2)
    raise ValueError(mode)


def resample_3d(x: jnp.ndarray, mode: str = "keep") -> jnp.ndarray:
    """(..., Z, H, W, C): resample H/W only (stereo depth untouched)."""
    return resample_2d(x, mode)


def patchify_2d(x: jnp.ndarray, patch_h: int, patch_w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/ph, W/pw, C*ph*pw) space-to-channel fold."""
    b, h, w, c = x.shape
    if h % patch_h or w % patch_w:
        raise ValueError("dims must be divisible by patch size")
    y = x.reshape(b, h // patch_h, patch_h, w // patch_w, patch_w, c)
    y = y.transpose(0, 1, 3, 5, 2, 4)  # (B, H', W', C, ph, pw)
    return y.reshape(b, h // patch_h, w // patch_w, c * patch_h * patch_w)


def unpatchify_2d(x: jnp.ndarray, patch_h: int, patch_w: int) -> jnp.ndarray:
    b, hh, ww, cpp = x.shape
    c = cpp // (patch_h * patch_w)
    y = x.reshape(b, hh, ww, c, patch_h, patch_w)
    y = y.transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(b, hh * patch_h, ww * patch_w, c)


def space_to_channel_2d(x: jnp.ndarray) -> jnp.ndarray:
    return patchify_2d(x, 2, 2)


def channel_to_space_2d(x: jnp.ndarray) -> jnp.ndarray:
    return unpatchify_2d(x, 2, 2)


def space_to_channel_3d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, Z, H, W, C) -> (B, Z, H/2, W/2, 4C)."""
    b, z = x.shape[0], x.shape[1]
    y = patchify_2d(x.reshape((b * z,) + x.shape[2:]), 2, 2)
    return y.reshape((b, z) + y.shape[1:])


def channel_to_space_3d(x: jnp.ndarray) -> jnp.ndarray:
    b, z = x.shape[0], x.shape[1]
    y = unpatchify_2d(x.reshape((b * z,) + x.shape[2:]), 2, 2)
    return y.reshape((b, z) + y.shape[1:])


def midside_transform(x: jnp.ndarray, channel_axis: int = 1) -> jnp.ndarray:
    """Stereo mid/side: ((L+R), (L-R)) / sqrt(2) along ``channel_axis``."""
    l = jax.lax.index_in_dim(x, 0, axis=channel_axis, keepdims=False)
    r = jax.lax.index_in_dim(x, 1, axis=channel_axis, keepdims=False)
    return jnp.stack([l + r, l - r], axis=channel_axis) * 0.5 ** 0.5


def wavelet_decompose_2d(x: jnp.ndarray, num_levels: int = 4) -> list:
    """Laplacian pyramid on (..., H, W, C)."""
    wavelets = []
    for i in range(num_levels):
        if i == num_levels - 1:
            wavelets.append(x)
        else:
            x_down = resample_2d(x, "down")
            wavelets.append(x - resample_2d(x_down, "up"))
            x = x_down
    return wavelets


def wavelet_recompose_2d(wavelets: list) -> jnp.ndarray:
    x = list(wavelets)
    y = x.pop()
    while x:
        y = resample_2d(y, "up") + x.pop()
    return y


# ---------------------------------------------------------------------------
# spectral helpers
# ---------------------------------------------------------------------------

def lowpass_2d(x: jnp.ndarray, blur_width: float = 16.0,
               use_circular_filter: bool = True) -> jnp.ndarray:
    """FFT brick-wall low-pass with reflect padding on (..., H, W, C)
    (reference: mp_tools.py:121-160)."""
    h, w = x.shape[-3], x.shape[-2]
    pad_h, pad_w = h // 2, w // 2
    padw = [(0, 0)] * (x.ndim - 3) + [(pad_h, pad_h), (pad_w, pad_w), (0, 0)]
    xp = jnp.pad(x, padw, mode="reflect").astype(jnp.float32)
    ph, pw = h + 2 * pad_h, w + 2 * pad_w
    xf = jnp.fft.rfft2(xp, axes=(-3, -2), norm="ortho")
    fh = np.fft.fftfreq(ph)
    fw = np.fft.rfftfreq(pw)
    if use_circular_filter:
        dist = np.sqrt(fh[:, None] ** 2 + fw[None, :] ** 2)
    else:
        dist = np.maximum(np.abs(fh)[:, None], np.abs(fw)[None, :])
    mask = (dist <= 1.0 / blur_width)[..., None]
    xf = xf * jnp.asarray(mask)
    y = jnp.fft.irfft2(xf, s=(ph, pw), axes=(-3, -2), norm="ortho")
    y = y[..., pad_h:pad_h + h, pad_w:pad_w + w, :]
    return y.astype(x.dtype)


def randn_like_hp_2d(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """High-pass-shaped gaussian noise (reference: mp_tools.py:246-263).

    Note the reference raises the complex noise to the power of the boolean
    mask (z**0 == 1 in the stop band) rather than zeroing it — reproduced
    faithfully via where(mask, z, 1).
    """
    h, w = x.shape[-3], x.shape[-2]
    kr, ki = jax.random.split(key)
    shape = x.shape[:-3] + (h, w // 2 + 1, x.shape[-1])
    zr = jax.random.normal(kr, shape, jnp.float32)
    zi = jax.random.normal(ki, shape, jnp.float32)
    fy = np.abs(np.fft.fftfreq(h)) >= 0.25
    fx = np.abs(np.fft.rfftfreq(w)) >= 0.25
    mask = (fy[:, None] | fx[None, :])[..., None]
    z = jax.lax.complex(jnp.where(mask, zr, 1.0), jnp.where(mask, zi, 0.0))
    noise = jnp.fft.irfft2(z, s=(h, w), axes=(-3, -2), norm="ortho") * 1.5 ** 0.5
    return noise.astype(x.dtype)


def random_crop_2d(key: jax.Array, *tensors: jnp.ndarray, range_h: int = 8,
                   range_w: int = 8, dropout: float = 0.5):
    """Per-sample random (h, w) crop offsets with dropout mask
    (reference: mp_tools.py:224-243). Channel-last (B, H, W, C); output is
    (B, H-range_h, W-range_w, C)."""
    b, h, w, _ = tensors[0].shape
    kd, kh, kw = jax.random.split(key, 3)
    keep = (jax.random.uniform(kd, (b,)) >= dropout).astype(jnp.int32)
    h_off = jax.random.randint(kh, (b,), 0, max(range_h, 1)) * keep
    w_off = jax.random.randint(kw, (b,), 0, max(range_w, 1)) * keep

    def crop_one(x, ho, wo):
        return jax.lax.dynamic_slice(
            x, (ho, wo, 0), (x.shape[0] - range_h, x.shape[1] - range_w, x.shape[2]))

    outs = []
    for x in tensors:
        outs.append(jax.vmap(crop_one)(x, h_off, w_off))
    return tuple(outs)
