"""Sequence/context-parallel ops: time-axis sharding with halo exchange.

The reference scales clip length on one GPU via overlap-discard tiled
encoding (reference: src/modules/daes/dae_edm2_q4.py:352-405). The
TPU-native multi-device equivalent (SURVEY.md §5.7): shard the time axis of
the spectrogram across the mesh with ``shard_map`` and exchange halos with
``jax.lax.ppermute`` so every shard sees its neighbors' context.

With halo >= the encoder's receptive-field radius the sharded result is
numerically equal to the unsharded encode everywhere except within one
receptive-field radius of the TRUE clip edges: interior shard boundaries
see real neighbor samples; the outer halos are zeros, which differs
slightly from per-layer zero padding once biases propagate through the
halo columns (the reference's overlap-discard tiling has the same
seam-approximation property, dae_edm2_q4.py:352-405).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def sharded_tiled_encode(encode_fn: Callable, variables, x: jnp.ndarray,
                         mesh: Mesh, halo: int, downsample_ratio: int,
                         axis_name: str = "data") -> jnp.ndarray:
    """Encode (B, H, W, C) with W sharded over ``axis_name``.

    encode_fn(variables, x_chunk) -> latents with W' = W_chunk/ds.
    ``halo`` must be a multiple of downsample_ratio and >= the encoder's
    receptive-field radius.
    """
    n = mesh.shape[axis_name]
    ds = downsample_ratio
    assert halo % ds == 0, "halo must be a multiple of the downsample ratio"
    assert x.shape[2] % (n * ds) == 0, (
        f"W={x.shape[2]} must divide evenly into {n} shards x ds {ds}")

    def local(x_shard):
        idx = jax.lax.axis_index(axis_name)
        # exchange halos around the ring, then zero the wrap-around edges
        right_edge = x_shard[:, :, -halo:]   # goes to right neighbor's left
        left_edge = x_shard[:, :, :halo]     # goes to left neighbor's right
        from_left = jax.lax.ppermute(right_edge, axis_name,
                                     [(i, (i + 1) % n) for i in range(n)])
        from_right = jax.lax.ppermute(left_edge, axis_name,
                                      [(i, (i - 1) % n) for i in range(n)])
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                               from_right)
        ext = jnp.concatenate([from_left, x_shard, from_right], axis=2)
        lat = encode_fn(variables, ext)
        h = halo // ds
        return lat[:, :, h: lat.shape[2] - h]

    fn = shard_map(local, mesh=mesh,
                   in_specs=P(None, None, axis_name, None),
                   out_specs=P(None, None, axis_name, None))
    x = jax.device_put(x, NamedSharding(mesh, P(None, None, axis_name, None)))
    return fn(x)


def sharded_tiled_decode(decode_fn: Callable, variables, latents: jnp.ndarray,
                         mesh: Mesh, halo_latent: int, downsample_ratio: int,
                         axis_name: str = "data") -> jnp.ndarray:
    """Decode latents (B, h, w, c) with w sharded; halo in LATENT pixels."""
    n = mesh.shape[axis_name]
    ds = downsample_ratio
    assert latents.shape[2] % n == 0

    def local(l_shard):
        idx = jax.lax.axis_index(axis_name)
        right_edge = l_shard[:, :, -halo_latent:]
        left_edge = l_shard[:, :, :halo_latent]
        from_left = jax.lax.ppermute(right_edge, axis_name,
                                     [(i, (i + 1) % n) for i in range(n)])
        from_right = jax.lax.ppermute(left_edge, axis_name,
                                      [(i, (i - 1) % n) for i in range(n)])
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                               from_right)
        ext = jnp.concatenate([from_left, l_shard, from_right], axis=2)
        out = decode_fn(variables, ext)
        h = halo_latent * ds
        return out[:, :, h: out.shape[2] - h]

    fn = shard_map(local, mesh=mesh,
                   in_specs=P(None, None, axis_name, None),
                   out_specs=P(None, None, axis_name, None))
    latents = jax.device_put(
        latents, NamedSharding(mesh, P(None, None, axis_name, None)))
    return fn(latents)
