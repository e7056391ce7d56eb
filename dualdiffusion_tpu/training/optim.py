"""Optimizers and gradient/parameter transforms (optax).

Capability parity with the reference's optimizer stack:

  * forced MP weight re-normalization after each step
    (reference: src/modules/mp_tools.py:375-378 + src/training/
    trainer.py:1107-1108) — here a pure params transform keyed on the
    ``w_mp`` param name (SURVEY.md §7.1).
  * dynamic z-score gradient clipping via log-domain EMAs of the grad norm
    (reference: trainer.py:407-431) — an optax transform whose state
    (logmean, logvar) lives in the opt state and is checkpointed.
  * LR schedules: edm2 (inverse-sqrt-style decay w/ linear warmup),
    edm2_smooth (cosine warmup + power decay), constant
    (reference: trainer.py:639-700).
  * fused AdamW (optax.adamw — XLA fuses the update) and Muon / NorMuon
    with Newton-Schulz-5 orthogonalization, grouped-conv flattening and
    fnmatch-pattern parameter routing (reference: src/training/muon.py,
    nor_muon.py:72-227).
"""

from __future__ import annotations

import fnmatch
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.layers import MP_WEIGHT_NAME, normalize_weight


# ---------------------------------------------------------------------------
# forced weight normalization (params transform, not a gradient transform)
# ---------------------------------------------------------------------------

def _path_has_key(path, name: str) -> bool:
    return any(getattr(k, "key", None) == name for k in path)


def normalize_mp_weights(params):
    """Re-normalize every ``w_mp`` leaf to per-out-channel unit RMS."""
    return jax.tree_util.tree_map_with_path(
        lambda p, v: normalize_weight(v) if _path_has_key(p, MP_WEIGHT_NAME) else v,
        params)


# ---------------------------------------------------------------------------
# dynamic z-score gradient clipping
# ---------------------------------------------------------------------------

class DynamicClipState(NamedTuple):
    grad_norm_logmean: jnp.ndarray
    grad_norm_logvar: jnp.ndarray
    last_grad_norm: jnp.ndarray
    last_max_norm: jnp.ndarray


def dynamic_grad_clip(z: Optional[float] = 4.0, static_max_norm: float = 10.0,
                      mean_ema_beta: float = 0.99, std_ema_beta: float = 0.99,
                      eps: float = 1e-8):
    """Clip by global norm at mean + z*std of the grad-norm history
    (log-domain EMAs, reference: trainer.py:407-431). ``z=None`` falls back
    to a static max norm. NaN/Inf grads are zeroed (the JAX-native analog of
    the reference's NaN halt — the step becomes a no-op and the event is
    visible in last_grad_norm)."""

    def init(params):
        del params
        return DynamicClipState(jnp.zeros(()), jnp.zeros(()),
                                jnp.zeros(()), jnp.float32(static_max_norm))

    def update(updates, state: DynamicClipState, params=None):
        del params
        norm = optax.global_norm(updates)
        finite = jnp.isfinite(norm)
        norm_s = jnp.maximum(jnp.where(finite, norm, eps), eps)

        if z is not None:
            grad_mean = jnp.exp(state.grad_norm_logmean)
            grad_std = jnp.exp(state.grad_norm_logvar / 2.0)
            max_norm = grad_mean + grad_std * z
        else:
            max_norm = jnp.float32(static_max_norm)

        # warmup: until stats are seeded, don't trust the dynamic bound
        seeded = state.grad_norm_logmean != 0.0
        max_norm = jnp.where((z is not None) & seeded, max_norm,
                             jnp.float32(static_max_norm))

        scale = jnp.minimum(1.0, max_norm / norm_s)
        scale = jnp.where(finite, scale, 0.0)
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g * scale, 0.0), updates)

        grad_var = jnp.maximum((norm_s - jnp.exp(state.grad_norm_logmean)) ** 2, eps)
        new_logmean = jnp.where(
            finite,
            state.grad_norm_logmean * mean_ema_beta + (1 - mean_ema_beta) * jnp.log(norm_s),
            state.grad_norm_logmean)
        new_logvar = jnp.where(
            finite,
            state.grad_norm_logvar * std_ema_beta + (1 - std_ema_beta) * jnp.log(grad_var),
            state.grad_norm_logvar)
        return updates, DynamicClipState(new_logmean, new_logvar, norm, max_norm)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# LR schedules (reference: trainer.py:639-700)
# ---------------------------------------------------------------------------

def lr_schedule(name: str, learning_rate: float, warmup_steps: int = 5000,
                reference_steps: int = 70000, decay_exponent: float = 1.0,
                min_learning_rate: float = 0.0,
                num_processes: int = 1) -> Callable:
    w = warmup_steps * num_processes
    r = reference_steps * num_processes

    if name == "edm2":
        def fn(step):
            lr = jnp.float32(1.0)
            lr = jnp.where(step < w, step / jnp.maximum(w, 1), lr)
            decayed = lr / jnp.maximum((step / r) ** decay_exponent, 1.0)
            decayed = jnp.maximum(decayed * learning_rate, min_learning_rate) / learning_rate
            lr = jnp.where(step > r, decayed, lr)
            return lr * learning_rate
    elif name == "edm2_smooth":
        def fn(step):
            theta = step / jnp.maximum(w, 1) * np.pi + np.pi
            warm = (jnp.cos(theta) + 1.0) / 2.0
            lr = jnp.where(step < w, warm, 1.0)
            lr = lr / (1.0 + (step / r) ** decay_exponent)
            return lr * learning_rate
    elif name == "constant":
        def fn(step):
            return jnp.where(step < w, step / jnp.maximum(w, 1), 1.0) * learning_rate
    else:
        raise ValueError(f"unsupported lr schedule: {name}")
    return fn


# ---------------------------------------------------------------------------
# Muon / NorMuon
# ---------------------------------------------------------------------------

def _newton_schulz5(g: jnp.ndarray, steps: int = 5, eps: float = 1e-7) -> jnp.ndarray:
    """Quintic Newton-Schulz orthogonalization (Muon; reference:
    nor_muon.py:72-110). Operates on a 2D matrix in bf16-friendly fp32."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.float32)
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)
    for _ in range(steps):
        xxt = x @ x.T
        x = a * x + (b * xxt + c * (xxt @ xxt)) @ x
    return (x.T if transposed else x)


class MuonState(NamedTuple):
    momentum: Any
    nu: Any  # per-neuron second moment (NorMuon); zeros when unused
    count: jnp.ndarray


def muon(learning_rate: Callable | float = 0.02, momentum: float = 0.95,
         nesterov: bool = True, ns_steps: int = 5,
         use_normuon: bool = False, nu_beta: float = 0.95, eps: float = 1e-8):
    """Muon: orthogonalized-momentum updates for >=2D weights; grouped-conv
    weights are flattened to (out, -1) before Newton-Schulz
    (reference: nor_muon.py:138-227). NorMuon adds per-output-neuron
    second-moment normalization.

    Deliberate deviation: momentum uses the published Muon sum convention
    (m = beta*m + g, nesterov mix beta*m + g) rather than the reference's
    lerp convention (m = beta*m + (1-beta)*g) — the Newton-Schulz output is
    scale-invariant so only the momentum/gradient MIX ratio differs
    (beta vs beta/(1-beta)); tune ``momentum`` accordingly when porting
    reference hyperparameters. The NS5 core itself is goldened against the
    reference (tests/test_reference_parity.py)."""

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros((p.shape[0],), jnp.float32) if p.ndim >= 2 else jnp.zeros(()),
            params)
        return MuonState(zeros, nu, jnp.zeros((), jnp.int32))

    def update(updates, state: MuonState, params=None):
        del params
        count = state.count + 1

        new_mom = jax.tree_util.tree_map(
            lambda m, g: m * momentum + g, state.momentum, updates)

        def orth(m, g, nu):
            if m.ndim < 2:
                return m, nu  # handled by aux optimizer normally
            eff = m * momentum + g if nesterov else m
            flat = eff.reshape(eff.shape[0], -1)
            o = _newton_schulz5(flat, ns_steps)
            if use_normuon:
                new_nu = nu * nu_beta + (1 - nu_beta) * jnp.mean(o ** 2, axis=1)
                o = o / (jnp.sqrt(new_nu)[:, None] + eps)
                # re-scale to keep overall update RMS comparable
                o = o * jnp.sqrt(o.shape[0] / max(o.size, 1))
            else:
                new_nu = nu
            scale = jnp.sqrt(jnp.maximum(1.0, flat.shape[0] / flat.shape[1]))
            return (o * scale).reshape(eff.shape), new_nu

        orth_and_nu = jax.tree_util.tree_map(
            lambda m, g, nu: orth(m, g, nu), new_mom, updates, state.nu)
        # optax.multi_transform masks non-routed leaves with empty
        # MaskedNode tuples — only unpack real (update, nu) pairs
        is_pair = lambda t: isinstance(t, tuple) and len(t) == 2
        new_updates = jax.tree_util.tree_map(lambda t: t[0], orth_and_nu,
                                             is_leaf=is_pair)
        new_nu = jax.tree_util.tree_map(lambda t: t[1], orth_and_nu,
                                        is_leaf=is_pair)

        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        new_updates = jax.tree_util.tree_map(lambda u: -lr * u, new_updates)
        return new_updates, MuonState(new_mom, new_nu, count)

    return optax.GradientTransformation(init, update)


def build_optimizer(name: str = "adamw", learning_rate: float | Callable = 1e-3,
                    betas: Sequence[float] = (0.9, 0.99), eps: float = 1e-8,
                    weight_decay: float = 0.0,
                    muon_patterns: Sequence[str] = ("*w_mp*",),
                    dynamic_clip_z: Optional[float] = 4.0,
                    max_grad_norm: float = 10.0,
                    **muon_kwargs) -> optax.GradientTransformation:
    """Full gradient chain: dynamic clip -> optimizer.

    ``muon``/``normuon`` route params matching ``muon_patterns`` (fnmatch on
    the '/'-joined param path) through Muon and the rest through AdamW
    (reference: trainer.py:477-522 fnmatch routing)."""
    clip = dynamic_grad_clip(z=dynamic_clip_z, static_max_norm=max_grad_norm)

    if name == "adamw":
        opt = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay)
    elif name in ("muon", "normuon"):
        mu = muon(learning_rate, use_normuon=(name == "normuon"), **muon_kwargs)
        adam = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)

        def label_fn(params):
            def label(path, v):
                key = "/".join(str(getattr(k, "key", k)) for k in path)
                use_muon = v.ndim >= 2 and any(
                    fnmatch.fnmatch(key, pat) for pat in muon_patterns)
                return "muon" if use_muon else "adam"
            return jax.tree_util.tree_map_with_path(label, params)

        opt = optax.multi_transform({"muon": mu, "adam": adam}, label_fn)
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    return optax.chain(clip, opt)
