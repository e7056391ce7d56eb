"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.parallel import (make_mesh, MeshConfig, shard_batch,
                                        sharded_tiled_encode,
                                        sharded_tiled_decode)
from dualdiffusion_tpu.models.dae import DAE, DAEConfig


@pytest.fixture(scope="module")
def dae_setup():
    key = jax.random.PRNGKey(0)
    cfg = DAEConfig(model_channels=8, channel_mult_enc=(1, 2),
                    channel_mult_dec=(1, 2), num_enc_layers_per_block=1,
                    num_dec_layers_per_block=1, latent_channels=4)
    model = DAE(cfg)
    x = jax.random.normal(key, (1, 16, 512, 2))
    variables = model.init(key, x)
    return model, variables, x


def test_sharded_encode_matches_unsharded(dae_setup):
    model, variables, x = dae_setup
    mesh = make_mesh()
    ds = model.downsample_ratio

    def enc(v, chunk):
        return model.apply(v, chunk, method=DAE.encode)

    full = model.apply(variables, x, method=DAE.encode)
    # receptive field of 2 blocks of 3x3 convs at 2 scales is well under 32
    sharded = sharded_tiled_encode(enc, variables, x, mesh, halo=32,
                                   downsample_ratio=ds)
    assert sharded.shape == full.shape
    # exact in the interior; the outer receptive-field radius of the true
    # clip edges differs (zero halos vs per-layer zero padding)
    a, b = np.asarray(sharded), np.asarray(full)
    np.testing.assert_allclose(a[:, :, 8:-8], b[:, :, 8:-8],
                               rtol=1e-4, atol=1e-4)
    assert np.abs(a - b).max() < 2.0  # edges bounded


def test_sharded_decode_matches_unsharded(dae_setup):
    model, variables, x = dae_setup
    mesh = make_mesh()
    ds = model.downsample_ratio
    latents = model.apply(variables, x, method=DAE.encode)

    def dec(v, l):
        return model.apply(v, l, method=DAE.decode)

    full = model.apply(variables, latents, method=DAE.decode)
    sharded = sharded_tiled_decode(dec, variables, latents, mesh,
                                   halo_latent=16, downsample_ratio=ds)
    assert sharded.shape == full.shape
    a, b = np.asarray(sharded), np.asarray(full)
    np.testing.assert_allclose(a[:, :, 64:-64], b[:, :, 64:-64],
                               rtol=1e-4, atol=1e-4)


def test_mesh_and_batch_sharding():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    batch = shard_batch(mesh, {"x": np.zeros((16, 4), np.float32)})
    assert not batch["x"].sharding.is_fully_replicated
