"""Checkpointable train state + the jitted UNet diffusion train step.

The reference's training step (reference: src/training/module_trainers/
unet_trainer.py:74-308 + src/training/trainer.py:979-1160) is rebuilt as one
pure function over a single pytree TrainState (SURVEY.md §7.1):

  state = (params, opt_state, ema bank, sigma-pdf state, counters, rng)

TPU-native mapping of the reference's step:

  * stratified whole-batch sigma: computed on every device from the shared
    per-step key — replaces rank-0 sampling + accelerator.gather
    (unet_trainer.py:196-198) with zero communication.
  * gradient accumulation: ``lax.scan`` over microbatches inside the step
    (replaces trainer.py:1001-1067).
  * forced MP weight re-normalization after the optimizer update
    (trainer.py:1107-1108) as a params tree-map.
  * multi-profile EMA update fused into the same step (ema.py:284-321).
  * dynamic z-score grad clipping lives in the optax chain state.
  * loss = EDM2-weighted MSE / exp(logvar) + logvar with conditioning
    dropout, optional input perturbation and dynamic sigma_data
    (unet_trainer.py:236-290).

Data parallelism: jit with params/opt/ema replicated and the batch sharded
over the 'data' mesh axis; XLA inserts the grad psum.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mp import normalize
from .ema import EMABank
from .optim import normalize_mp_weights
from .sigma_sampler import SigmaSampler, SigmaSamplerConfig


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_state: Any
    sigma_pdf: jnp.ndarray
    global_step: jnp.ndarray            # int32
    total_samples_processed: jnp.ndarray  # int64-ish (int32 ok for now)
    rng: jax.Array


@dataclass
class UNetTrainConfig:
    sigma: SigmaSamplerConfig = field(default_factory=SigmaSamplerConfig)
    conditioning_dropout: float = 0.1
    conditioning_perturbation: float = 0.0
    input_perturbation: float = 0.0
    use_dynamic_sigma_data: bool = False
    dynamic_sigma_data_min: float = 0.5
    dynamic_sigma_data_max: float = 2.0
    dynamic_sigma_data_exp: float = 1.0
    num_loss_buckets: int = 10
    loss_buckets_sigma_min: float = 0.0002
    loss_buckets_sigma_max: float = 20000.0
    crop_edges: int = 0
    grad_accum_steps: int = 1


def make_unet_train_step(unet_apply: Callable, get_embeddings: Callable,
                         get_logvar: Callable, optimizer: optax.GradientTransformation,
                         ema_bank: Optional[EMABank], config: UNetTrainConfig,
                         total_batch_size: int,
                         prepare_fn: Optional[Callable] = None):
    """Build the train step.

    unet_apply(params, x, sigma, embeddings, x_ref, key) -> D_x
    get_embeddings(params, emb_in, cond_mask) -> embeddings or None
    get_logvar(params, sigma) -> (B,1,1,1) logvar
    prepare_fn(batch, key) -> batch with samples/ref_samples/embeddings —
      gradient-free input preparation (e.g. the DDEC teacher pipeline,
      reference: ddec_q4_trainer.py:94-131); runs inside the jitted step.
    """
    sampler = SigmaSampler(config.sigma)

    def loss_fn(params, batch, sigma, key):
        if prepare_fn is not None:
            key, k_prep = jax.random.split(key)
            batch = jax.lax.stop_gradient(prepare_fn(batch, k_prep))
        samples = batch["samples"].astype(jnp.float32)
        if config.crop_edges > 0:
            c = config.crop_edges
            samples = samples[..., c:-c, :]
        ref = batch.get("ref_samples")
        emb_in = batch.get("embeddings")
        b = samples.shape[0]
        # every split below is consumed unconditionally; optional consumers
        # (conditioning/input perturbation) derive theirs via fold_in so a
        # disabled knob leaves no dangling RNG stream (tested:
        # tests/test_training.py input-perturbation cases)
        k_cond, k_noise, k_drop = jax.random.split(key, 3)

        embeddings = None
        if emb_in is not None:
            cond_mask = (jax.random.uniform(k_cond, (b,))
                         > config.conditioning_dropout).astype(jnp.float32)
            embeddings = get_embeddings(params, emb_in, cond_mask)
            if config.conditioning_perturbation > 0:
                embeddings = embeddings + jax.random.normal(
                    jax.random.fold_in(key, 1), embeddings.shape
                ) * config.conditioning_perturbation

        sig_b = sigma.reshape((-1,) + (1,) * (samples.ndim - 1))
        noise = jax.random.normal(k_noise, samples.shape) * sig_b
        x_noisy = samples + noise

        if config.input_perturbation > 0:
            # sigma-scaled extra noise on the NETWORK input only; the model
            # denoises samples+noise through its c_skip path (reference:
            # unet_trainer.py:254-261 feeding unet_edm2_b4.py:255-267)
            pert = jax.random.normal(jax.random.fold_in(key, 2),
                                     samples.shape)
            x_pert = x_noisy + pert * sig_b * config.input_perturbation
            denoised = unet_apply(params, x_noisy, sigma, embeddings, ref,
                                  k_drop, x_pert)
        else:
            denoised = unet_apply(params, x_noisy, sigma, embeddings, ref,
                                  k_drop)

        if config.use_dynamic_sigma_data:
            # per-sample effective sigma_data (unet_trainer.py:262-268)
            n = np.prod(samples.shape[1:])
            sd = jnp.sqrt(jnp.sum(samples ** 2, axis=tuple(range(1, samples.ndim)),
                                  keepdims=True) / n)
            sd = jnp.clip(sd, config.dynamic_sigma_data_min,
                          config.dynamic_sigma_data_max) ** config.dynamic_sigma_data_exp
        else:
            sd = config.sigma.sigma_data
        loss_weight = (sig_b ** 2 + sd ** 2) / (sig_b * sd) ** 2
        mse = (denoised - samples) ** 2
        weighted = (mse * loss_weight).mean(axis=tuple(range(1, samples.ndim)))

        logvar = get_logvar(params, sigma).reshape(-1)
        nll = weighted / jnp.exp(logvar) + logvar
        loss = nll.mean()

        aux = {"loss_weighted": weighted, "sigma": sigma,
               "denoised_std": denoised.std(),
               "error_logvar": logvar.mean()}
        return loss, aux

    def bucket_losses(weighted, sigma):
        nb = config.num_loss_buckets
        if nb <= 0:
            return None, None
        q = (jnp.log(sigma) - np.log(config.loss_buckets_sigma_min)) / (
            np.log(config.loss_buckets_sigma_max) - np.log(config.loss_buckets_sigma_min))
        idx = jnp.clip((q * nb).astype(jnp.int32), 0, nb - 1)
        sums = jax.ops.segment_sum(weighted, idx, num_segments=nb)
        counts = jax.ops.segment_sum(jnp.ones_like(weighted), idx, num_segments=nb)
        return sums, counts

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        rng, step_key, sigma_key = jax.random.split(state.rng, 3)

        # adaptive ln_pdf update (unet_trainer.py:193-195), on-device
        if config.sigma.distribution == "ln_pdf":
            pdf = sampler.update_pdf_from_logvar(
                lambda s: get_logvar(state.params, s), state.sigma_pdf,
                state.global_step.astype(jnp.float32))
        else:
            pdf = state.sigma_pdf

        # whole-(global)-batch stratified sigma from the shared key
        global_sigma = sampler.sample(sigma_key, total_batch_size, pdf)

        accum = config.grad_accum_steps
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]), batch)
        device_batch = jax.tree_util.tree_leaves(batch)[0].shape[0]
        sigma_micro = global_sigma[:device_batch].reshape(accum, -1)
        keys = jax.random.split(step_key, accum)

        def accum_body(carry, xs):
            grads_acc, loss_acc, aux_acc = carry
            mb, sg, k = xs
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb, sg, k)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            ws, wc = bucket_losses(aux["loss_weighted"], aux["sigma"])
            if ws is not None:
                aux_acc = {"bucket_sums": aux_acc["bucket_sums"] + ws,
                           "bucket_counts": aux_acc["bucket_counts"] + wc}
            return (grads_acc, loss_acc + loss, aux_acc), \
                (aux["denoised_std"], aux["loss_weighted"])

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        nb = max(config.num_loss_buckets, 1)
        init_aux = {"bucket_sums": jnp.zeros((nb,)), "bucket_counts": jnp.zeros((nb,))}
        (grads, loss_sum, aux_out), (dstd, sample_losses) = jax.lax.scan(
            accum_body, (zero_grads, 0.0, init_aux), (micro, sigma_micro, keys))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        loss = loss_sum / accum

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = normalize_mp_weights(params)

        samples_processed = state.total_samples_processed + total_batch_size
        if ema_bank is not None:
            ema_state, params = ema_bank.update(
                state.ema_state, params, state.total_samples_processed,
                total_batch_size, state.global_step.astype(jnp.float32))
        else:
            ema_state = state.ema_state

        new_state = TrainState(
            params=params, opt_state=opt_state, ema_state=ema_state,
            sigma_pdf=pdf, global_step=state.global_step + 1,
            total_samples_processed=samples_processed, rng=rng)

        logs = {"loss": loss, "denoised_std": dstd.mean(),
                "grad_norm": _find_clip_stat(opt_state, "last_grad_norm"),
                "max_grad_norm": _find_clip_stat(opt_state, "last_max_norm"),
                "bucket_sums": aux_out["bucket_sums"],
                "bucket_counts": aux_out["bucket_counts"],
                # per-sample weighted losses in original batch order (the
                # microbatch reshape splits the leading dim contiguously)
                "sample_losses": sample_losses.reshape(-1)}
        return new_state, logs

    return train_step


def make_unet_eval_step(unet_apply: Callable, get_embeddings: Callable,
                        config: UNetTrainConfig,
                        prepare_fn: Optional[Callable] = None):
    """Validation step: EDM2-weighted loss with static stratified sigmas and
    no conditioning dropout (reference: unet_trainer.py is_validation_batch
    path — weighted loss without the NLL logvar term)."""
    import dataclasses as _dc
    sigma_cfg = _dc.replace(config.sigma, use_static_sigma_sampling=True)
    sampler = SigmaSampler(sigma_cfg)

    def eval_step(params, batch, key):
        if prepare_fn is not None:
            key, k_prep = jax.random.split(key)
            batch = jax.lax.stop_gradient(prepare_fn(batch, k_prep))
        samples = batch["samples"].astype(jnp.float32)
        if config.crop_edges > 0:
            c = config.crop_edges
            samples = samples[..., c:-c, :]
        b = samples.shape[0]
        emb_in = batch.get("embeddings")
        embeddings = None
        if emb_in is not None:
            embeddings = get_embeddings(params, emb_in, jnp.ones((b,)))
        k_noise, k_drop = jax.random.split(key)
        sigma = sampler.sample(jax.random.fold_in(key, 1), b)
        sig = sigma.reshape((-1,) + (1,) * (samples.ndim - 1))
        noise = jax.random.normal(k_noise, samples.shape) * sig
        denoised = unet_apply(params, samples + noise, sigma, embeddings,
                              batch.get("ref_samples"), k_drop)
        sd = config.sigma.sigma_data
        weight = (sig ** 2 + sd ** 2) / (sig * sd) ** 2
        return (((denoised - samples) ** 2) * weight).mean()

    return jax.jit(eval_step)


def _find_clip_stat(opt_state, name: str):
    from .optim import DynamicClipState
    found = [jnp.zeros(())]

    def visit(s):
        if isinstance(s, DynamicClipState):
            found[0] = getattr(s, name)
        elif isinstance(s, tuple):
            for x in s:
                visit(x)

    visit(opt_state)
    return found[0]


def init_train_state(params, optimizer: optax.GradientTransformation,
                     ema_bank: Optional[EMABank], sigma_config: SigmaSamplerConfig,
                     key: jax.Array, trainable=None) -> TrainState:
    """``params`` is the full variables pytree carried in the state;
    ``trainable`` (default: params, or params['params'] when the tree has a
    'params'/'stats' split) is the subtree the optimizer state covers."""
    if trainable is None:
        if isinstance(params, dict) and "params" in params and "stats" in params:
            trainable = params["params"]
        else:
            trainable = params
    sampler = SigmaSampler(sigma_config)
    return TrainState(
        params=params,
        opt_state=optimizer.init(trainable),
        ema_state=ema_bank.init(params) if ema_bank is not None else {},
        sigma_pdf=sampler.init_pdf_state(),
        global_step=jnp.zeros((), jnp.int32),
        total_samples_processed=jnp.zeros((), jnp.int32),
        rng=key)
