"""Correctness probe: UNet forward with a collect_wker-augmented tree
(loop-invariant Pallas kernel-layout weights) must match the plain
forward bitwise-closely, with DD_PALLAS_PAIR on and off.

Run on TPU (the Pallas route is TPU-native):
  DD_GROUPED_PALLAS_CONV=1 python scripts/wker_check.py
"""
import os
import sys

os.environ.setdefault("DD_GROUPED_PALLAS_CONV", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dualdiffusion_tpu.models.layers import collect_wker  # noqa: E402
from dualdiffusion_tpu.models.unet import UNet, UNetConfig  # noqa: E402


def main():
    # flagship-ish scale, wide enough W for the Pallas routing predicate
    cfg = UNetConfig(in_channels=8, out_channels=8, in_channels_emb=1024,
                     model_channels=64, channel_mult=(1, 2, 3, 4),
                     num_layers_per_block=2, attn_levels=(2, 3),
                     attn_axis="freq", logvar_channels=128,
                     mlp_multiplier=2, mlp_groups=8)
    model = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 688, 8))
    sigma = jnp.full((2,), 3.7)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 1024))
    variables = jax.jit(lambda k: model.init(
        k, x[:1], sigma[:1], emb[:1], method=UNet.init_all))(key)
    emb_c = jax.jit(lambda v, e: model.apply(
        v, e, jnp.ones((2,)), method=UNet.get_embeddings))(variables, emb)

    base = jax.jit(lambda v: model.apply(v, x, sigma, emb_c))(variables)
    for pair in ("0", "1"):
        os.environ["DD_PALLAS_PAIR"] = pair
        aug = jax.jit(lambda v: collect_wker(
            model.apply, v, x, sigma, emb_c))(variables)
        n_wker = len(jax.tree_util.tree_leaves(aug.get("wker", {})))
        out = jax.jit(lambda v: model.apply(v, x, sigma, emb_c))(aug)
        err = float(jnp.max(jnp.abs(out - base))
                    / (jnp.max(jnp.abs(base)) + 1e-12))
        print(f"pair={pair} wker_leaves={n_wker} rel_err={err:.3e}",
              flush=True)
        assert np.isfinite(err) and err < 5e-3, err
        assert n_wker > 0, "wker collection is empty — routing never fired"
    print("OK")


if __name__ == "__main__":
    main()
