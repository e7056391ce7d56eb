"""Sigma (noise-level) samplers for diffusion training — pure JAX, on-device.

Capability parity with the reference's SigmaSampler
(reference: src/training/sigma_sampler.py:35-212):

  * distributions: ln_normal, ln_sech (arctan-based), ln_sech^2, ln_linear,
    linear, scale_invariant, and ln_pdf (inverse-CDF sampling of a learned
    pdf derived from the UNet's per-sigma logvar, warmup-scaled and
    monotonic-sanitized).
  * stratified whole-batch quantiles ((i + 0.5)/n + jitter) and static
    stratification.

TPU-native design (SURVEY.md §7.4): the reference samples on rank 0 and
all-gathers (unet_trainer.py:196-198). Here every host/device derives the
WHOLE global batch's sigmas from the same PRNG key and slices its shard —
identical distribution, zero communication. The ln_pdf state (pdf/cdf) is a
plain jnp array pytree that lives in the train state, so the
logvar->pdf feedback loop stays on-device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erf


@dataclass
class SigmaSamplerConfig:
    sigma_max: float = 200.0
    sigma_min: float = 0.03
    sigma_data: float = 1.0
    distribution: str = "ln_sech"
    dist_scale: float = 1.0
    dist_offset: float = 0.3
    use_stratified_sigma_sampling: bool = True
    use_static_sigma_sampling: bool = False
    sigma_pdf_warmup_steps: int = 5000
    sigma_pdf_resolution: int = 127
    sigma_pdf_sanitization: bool = True
    sigma_pdf_offset: float = 0.0
    sigma_pdf_min: float = 1e-3

    @property
    def ln_sigma_min(self) -> float:
        return float(np.log(self.sigma_min))

    @property
    def ln_sigma_max(self) -> float:
        return float(np.log(self.sigma_max))


_DISTRIBUTIONS = ("ln_normal", "ln_sech", "ln_sech^2", "ln_linear", "linear",
                  "scale_invariant", "ln_pdf")


class SigmaSampler:
    def __init__(self, config: SigmaSamplerConfig) -> None:
        if config.distribution not in _DISTRIBUTIONS:
            raise ValueError(f"invalid distribution: {config.distribution}; "
                             f"known: {_DISTRIBUTIONS}")
        self.config = config

    # ---- pdf state (for ln_pdf) -------------------------------------------
    def init_pdf_state(self) -> jnp.ndarray:
        """Uniform pdf of resolution bins (jnp array; lives in TrainState)."""
        pdf = jnp.ones((self.config.sigma_pdf_resolution,), jnp.float32)
        return pdf / pdf.sum()

    @staticmethod
    def _sanitize_pdf(pdf: jnp.ndarray) -> jnp.ndarray:
        """Force monotonic rise to the max then monotonic fall
        (reference :170-175), shape-static via masked cummax/cummin."""
        n = pdf.shape[0]
        max_idx = jnp.argmax(pdf)
        idx = jnp.arange(n)
        # increasing part: running max over the prefix
        inc = jax.lax.associative_scan(jnp.maximum, pdf)
        # decreasing part: running min from max_idx on = -(running max of -pdf
        # starting at max_idx); mask out the prefix so it doesn't affect it
        neg = jnp.where(idx >= max_idx, -pdf, -jnp.inf)
        dec = -jax.lax.associative_scan(jnp.maximum, neg)
        return jnp.where(idx <= max_idx, inc, dec)

    def update_pdf_from_logvar(self, logvar_fn, pdf_state: jnp.ndarray,
                               global_step: jnp.ndarray) -> jnp.ndarray:
        """New pdf from the unet's per-sigma logvar head (reference :182-195).
        ``logvar_fn(sigma_array) -> logvar array``; fully on-device.
        """
        cfg = self.config
        if cfg.sigma_pdf_warmup_steps > 0:
            warmup = jnp.minimum(global_step / cfg.sigma_pdf_warmup_steps, 1.0)
        else:
            warmup = jnp.float32(1.0)
        ln_sigma = jnp.linspace(cfg.ln_sigma_min, cfg.ln_sigma_max,
                                cfg.sigma_pdf_resolution)
        err = logvar_fn(jnp.exp(ln_sigma)).reshape(-1)
        pdf = jnp.exp(-warmup * cfg.dist_scale * err)
        pdf = jnp.clip(pdf + cfg.sigma_pdf_offset, min=cfg.sigma_pdf_min)
        if cfg.sigma_pdf_sanitization:
            pdf = self._sanitize_pdf(pdf)
        return pdf / pdf.sum()

    # ---- quantiles ------------------------------------------------------------
    def _quantiles(self, key: jax.Array, n: int) -> jnp.ndarray:
        cfg = self.config
        if cfg.use_static_sigma_sampling:
            return (jnp.arange(n) + 0.5) / n
        if cfg.use_stratified_sigma_sampling:
            jitter = (jax.random.uniform(key, ()) - 0.5) / n
            return (jnp.arange(n) + 0.5) / n + jitter
        return jax.random.uniform(key, (n,))

    # ---- sampling ------------------------------------------------------------
    def sample(self, key: jax.Array, n_samples: int,
               pdf_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Sample the whole (global) batch's sigmas. Under data parallelism
        call with the same key everywhere and slice your shard."""
        kq, kp = jax.random.split(key)
        q = self._quantiles(kq, n_samples)
        # random per-batch permutation so stratified quantiles are not
        # correlated with sample index
        q = jax.random.permutation(kp, q)
        cfg = self.config
        name = cfg.distribution
        if name == "ln_normal":
            return self._ln_normal(q)
        if name == "ln_sech":
            return self._ln_sech(q)
        if name == "ln_sech^2":
            return self._ln_sech2(q)
        if name == "ln_linear":
            return self._ln_linear(q)
        if name == "linear":
            return self._linear(q)
        if name == "scale_invariant":
            return self._scale_invariant(q)
        if name == "ln_pdf":
            if pdf_state is None:
                pdf_state = self.init_pdf_state()
            return self._ln_pdf(q, pdf_state)
        raise AssertionError(name)

    def _clip(self, sigma):
        return jnp.clip(sigma, self.config.sigma_min, self.config.sigma_max)

    def _ln_normal(self, q):
        cfg = self.config
        def quantile_of(ln_s):
            return 0.5 * (1 + erf((2 ** 0.5 * ln_s - 2 ** 0.5 * cfg.dist_offset)
                                  / (2 * cfg.dist_scale)))
        lo = quantile_of(cfg.ln_sigma_min)
        hi = quantile_of(cfg.ln_sigma_max)
        q = lo + q * (hi - lo)
        ln_sigma = cfg.dist_offset + (cfg.dist_scale * 2 ** 0.5) * jnp.clip(
            jax.scipy.special.erfinv(q * 2 - 1), -6.0, 6.0)
        return self._clip(jnp.exp(ln_sigma))

    def _ln_sech(self, q):
        cfg = self.config
        theta_min = np.arctan(1 / cfg.sigma_max * np.exp(cfg.dist_offset))
        theta_max = np.arctan(1 / cfg.sigma_min * np.exp(cfg.dist_offset))
        theta = q * (theta_max - theta_min) + theta_min
        ln_sigma = jnp.log(1.0 / jnp.tan(theta)) * cfg.dist_scale + cfg.dist_offset
        return self._clip(jnp.exp(ln_sigma))

    def _ln_sech2(self, q):
        cfg = self.config
        low, high = np.tanh(cfg.ln_sigma_min), np.tanh(cfg.ln_sigma_max)
        ln_sigma = jnp.arctanh(q * (high - low) + low) * cfg.dist_scale + cfg.dist_offset
        rng = cfg.ln_sigma_max - cfg.ln_sigma_min
        ln_sigma = jnp.where(ln_sigma < cfg.ln_sigma_min, ln_sigma + rng, ln_sigma)
        ln_sigma = jnp.where(ln_sigma > cfg.ln_sigma_max, ln_sigma - rng, ln_sigma)
        return self._clip(jnp.exp(ln_sigma))

    def _ln_linear(self, q):
        cfg = self.config
        ln_sigma = q * (cfg.ln_sigma_max - cfg.ln_sigma_min) + cfg.ln_sigma_min
        return self._clip(jnp.exp(ln_sigma))

    def _linear(self, q):
        cfg = self.config
        s = (q * (cfg.sigma_max ** (1 / cfg.dist_scale) - cfg.sigma_min ** (1 / cfg.dist_scale))
             + cfg.sigma_min ** (1 / cfg.dist_scale))
        return self._clip(s ** cfg.dist_scale)

    def _scale_invariant(self, q):
        cfg = self.config
        _min = 1 / cfg.sigma_max ** cfg.dist_scale
        _max = 1 / cfg.sigma_min ** cfg.dist_scale
        return 1.0 / (q * (_max - _min) + _min) ** (1 / cfg.dist_scale)

    def _ln_pdf(self, q, pdf: jnp.ndarray):
        cfg = self.config
        cdf = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(pdf / pdf.sum())])
        idx = jnp.clip(jnp.searchsorted(cdf, q), max=cdf.shape[0] - 2)
        left = cdf[idx]
        right = cdf[idx + 1]
        t = (q - left) / jnp.maximum(right - left, 1e-12)
        u = (idx + t) / (cdf.shape[0] - 1)
        ln_sigma = u * (cfg.ln_sigma_max - cfg.ln_sigma_min) + cfg.ln_sigma_min
        return self._clip(jnp.exp(ln_sigma))
