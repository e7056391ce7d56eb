"""Sigma-distribution histogram harness (reference: src/tests/
sigma_sampler.py:100 — matplotlib histograms of each distribution).
Prints text histograms (no display dependency) for every distribution.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.training.sigma_sampler import (SigmaSampler,
                                                          SigmaSamplerConfig)

    key = jax.random.PRNGKey(0)
    for dist in ["ln_normal", "ln_sech", "ln_sech^2", "ln_linear", "linear",
                 "scale_invariant"]:
        cfg = SigmaSamplerConfig(distribution=dist)
        s = SigmaSampler(cfg)
        sig = np.asarray(s.sample(key, 20000))
        ln = np.log(sig)
        hist, edges = np.histogram(ln, bins=24)
        peak = hist.max()
        print(f"\n{dist}:  sigma in [{sig.min():.4g}, {sig.max():.4g}]  "
              f"median {np.median(sig):.4g}")
        for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
            bar = "#" * int(40 * h / peak)
            print(f"  ln sigma [{e0:+6.2f},{e1:+6.2f}) {bar}")


if __name__ == "__main__":
    main()
