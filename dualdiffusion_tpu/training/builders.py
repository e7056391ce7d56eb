"""Wiring: TrainerConfig + Pipeline -> (jitted train step, TrainState, ...).

This is the config-driven module-trainer selection layer
(reference: src/training/trainer.py:196-202 dynamic import + module_trainer
instantiation :934) with an explicit registry instead of importlib.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils import config_from_dict
from .ema import EMABank, EMAConfig
from .module_trainers import (DAETrainConfig, DDECTrainConfig,
                              make_dae_train_step, make_ddec_train_step)
from .optim import build_optimizer, lr_schedule
from .sigma_sampler import SigmaSamplerConfig
from .train_state import (TrainState, UNetTrainConfig, init_train_state,
                          make_unet_train_step)
from .trainer import TrainerConfig, register_module_trainer

logger = logging.getLogger(__name__)


def _make_optimizer(tconf: TrainerConfig):
    lr = lr_schedule(tconf.lr_schedule.lr_schedule,
                     tconf.lr_schedule.learning_rate,
                     tconf.lr_schedule.lr_warmup_steps,
                     tconf.lr_schedule.lr_reference_steps,
                     tconf.lr_schedule.lr_decay_exponent,
                     tconf.lr_schedule.min_learning_rate)
    return build_optimizer(
        tconf.optimizer.optimizer, lr,
        betas=(tconf.optimizer.adam_beta1, tconf.optimizer.adam_beta2),
        eps=tconf.optimizer.adam_epsilon,
        weight_decay=tconf.optimizer.weight_decay,
        muon_patterns=tuple(tconf.optimizer.muon_patterns),
        dynamic_clip_z=tconf.optimizer.dynamic_max_grad_norm_z,
        max_grad_norm=tconf.optimizer.max_grad_norm)


def _make_ema_bank(tconf: TrainerConfig) -> Optional[EMABank]:
    if not tconf.emas:
        return None
    return EMABank([EMAConfig(name=k, **v) for k, v in tconf.emas.items()])


def _export_fn(pipeline, module_name: str):
    from ..pipelines.pipeline import save_module

    def export(ckpt_dir, variables):
        h = pipeline.modules[module_name]
        save_module(ckpt_dir, module_name, h.module_type, h.config, variables)
    return export


def _total_batch(tconf: TrainerConfig) -> int:
    """Global batch = device batch x grad accum x data-parallel width."""
    return (tconf.device_batch_size * tconf.gradient_accumulation_steps
            * max(jax.device_count(), 1))


@register_module_trainer("unet")
def build_unet_trainer(pipeline, tconf: TrainerConfig, key: jax.Array):
    """Latent-diffusion UNet training on pre-encoded latents."""
    from ..models.unet import UNet
    h = pipeline.modules[tconf.module_name]
    model, variables = h.module, h.variables
    cfg = config_from_dict(UNetTrainConfig, dict(tconf.module_trainer_config))
    cfg.grad_accum_steps = tconf.gradient_accumulation_steps

    def unet_apply(p, x, sigma, emb, ref, k, x_perturbed=None):
        return model.apply(p, x, sigma, emb, ref, training=True,
                           x_perturbed=x_perturbed, rngs={"dropout": k})

    def get_emb(p, emb_in, mask):
        return model.apply(p, emb_in, mask, method=UNet.get_embeddings)

    def get_logvar(p, sigma):
        return model.apply(p, sigma, method=UNet.get_sigma_loss_logvar)

    opt = _make_optimizer(tconf)
    bank = _make_ema_bank(tconf)
    step = make_unet_train_step(unet_apply, get_emb, get_logvar, opt, bank,
                                cfg, _total_batch(tconf))
    state = init_train_state(variables, opt, bank, cfg.sigma, key)
    # drop the pipeline's alias of the initial params: after step 1 it
    # would pin the stale buffers (1.4 GB at the 356M reference scale)
    h.variables = None

    def batch_adapter(batch):
        # dataset latents are stored reference-layout (B, C, H, W);
        # models are channel-last (B, H, W, C)
        lat = jnp.transpose(jnp.asarray(batch["latents"], jnp.float32),
                            (0, 2, 3, 1))
        return {"samples": lat,
                **({"embeddings": jnp.asarray(batch["audio_embeddings"])}
                   if "audio_embeddings" in batch else {})}

    return step, state, _export_fn(pipeline, tconf.module_name), bank, batch_adapter


@register_module_trainer("dae")
def build_dae_trainer(pipeline, tconf: TrainerConfig, key: jax.Array):
    h = pipeline.modules[tconf.module_name]
    cfg = config_from_dict(DAETrainConfig, dict(tconf.module_trainer_config))
    cfg.grad_accum_steps = tconf.gradient_accumulation_steps
    opt = _make_optimizer(tconf)
    bank = _make_ema_bank(tconf)
    step = make_dae_train_step(h.module, pipeline.format, opt, bank, cfg,
                               _total_batch(tconf))
    state = init_train_state(h.variables, opt, bank, SigmaSamplerConfig(), key)
    h.variables = None          # see build_unet_trainer

    def batch_adapter(batch):
        out = {"audio": jnp.asarray(batch["audio"])}
        if "audio_embeddings" in batch:
            out["audio_embeddings"] = jnp.asarray(batch["audio_embeddings"])
        return out

    return step, state, _export_fn(pipeline, tconf.module_name), bank, batch_adapter


@register_module_trainer("ddec")
def build_ddec_trainer(pipeline, tconf: TrainerConfig, key: jax.Array):
    from ..models.unet import UNet
    h = pipeline.modules[tconf.module_name]
    dae_h = pipeline.modules.get("dae")
    assert dae_h is not None, "ddec training requires a trained dae module"
    model = h.module
    cfg = config_from_dict(DDECTrainConfig, dict(tconf.module_trainer_config))
    cfg.unet.grad_accum_steps = tconf.gradient_accumulation_steps

    def ddec_apply(p, x, sigma, emb, ref, k, x_perturbed=None):
        return model.apply(p, x, sigma, emb, ref, training=True,
                           x_perturbed=x_perturbed, rngs={"dropout": k})

    def get_logvar(p, sigma):
        return model.apply(p, sigma, method=UNet.get_sigma_loss_logvar)

    opt = _make_optimizer(tconf)
    bank = _make_ema_bank(tconf)
    step = make_ddec_train_step(ddec_apply, get_logvar, dae_h.module,
                                dae_h.variables, pipeline.format, opt, bank,
                                cfg, _total_batch(tconf))
    state = init_train_state(h.variables, opt, bank, cfg.unet.sigma, key)
    h.variables = None          # the frozen dae teacher's stay referenced

    def batch_adapter(batch):
        out = {"audio": jnp.asarray(batch["audio"])}
        if "audio_embeddings" in batch:
            out["audio_embeddings"] = jnp.asarray(batch["audio_embeddings"])
        return out

    return step, state, _export_fn(pipeline, tconf.module_name), bank, batch_adapter


@register_module_trainer("dae_ddec")
def build_joint_dae_ddec_trainer(pipeline, tconf: TrainerConfig, key: jax.Array):
    """Joint DAE + DDEC training — the reference's multi-module
    `train_modules` mode (reference: training/trainer.py:204-209,
    1030-1042) with the DDEC conditioned on the live DAE reconstruction.
    `module_name` names the ddec module; the dae module is resolved from
    the pipeline. Checkpoints export BOTH modules."""
    from ..models.unet import UNet
    from ..pipelines.pipeline import save_module
    from .module_trainers import (JointDAEDDECConfig,
                                  make_joint_dae_ddec_train_step)
    h = pipeline.modules[tconf.module_name]
    dae_h = pipeline.modules.get("dae")
    assert dae_h is not None, "joint training requires a dae module"
    model = h.module
    cfg = config_from_dict(JointDAEDDECConfig, dict(tconf.module_trainer_config))
    cfg.grad_accum_steps = tconf.gradient_accumulation_steps

    def ddec_apply(p, x, sigma, emb, ref, k, x_perturbed=None):
        return model.apply(p, x, sigma, emb, ref, training=True,
                           x_perturbed=x_perturbed, rngs={"dropout": k})

    def get_logvar(p, sigma):
        return model.apply(p, sigma, method=UNet.get_sigma_loss_logvar)

    opt = _make_optimizer(tconf)
    bank = _make_ema_bank(tconf)
    step = make_joint_dae_ddec_train_step(dae_h.module, ddec_apply, get_logvar,
                                          pipeline.format, opt, bank, cfg,
                                          _total_batch(tconf))
    params = {"dae": dae_h.variables, "ddec": h.variables}
    trainable = {"dae": dae_h.variables["params"], "ddec": h.variables}
    state = init_train_state(params, opt, bank, cfg.ddec.unet.sigma, key,
                             trainable=trainable)
    h.variables = None          # see build_unet_trainer
    dae_h.variables = None

    def export(ckpt_dir, variables):
        save_module(ckpt_dir, "dae", dae_h.module_type, dae_h.config,
                    variables["dae"])
        save_module(ckpt_dir, tconf.module_name, h.module_type, h.config,
                    variables["ddec"])

    def batch_adapter(batch):
        out = {"audio": jnp.asarray(batch["audio"])}
        if "audio_embeddings" in batch:
            out["audio_embeddings"] = jnp.asarray(batch["audio_embeddings"])
        return out

    return step, state, export, bank, batch_adapter
