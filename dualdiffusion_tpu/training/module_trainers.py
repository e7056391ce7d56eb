"""Module trainers: the per-module training strategies.

Capability parity with the reference's ModuleTrainer plug-in architecture
(reference: src/training/module_trainers/module_trainer.py:29-45 and the
concrete unet/dae/ddec trainers). In this framework a module trainer is a
builder producing a pure jitted train step:

  * UNet (latent diffusion) — make_unet_train_step in train_state.py
    (reference: unet_trainer.py:74-308).
  * DDEC — the same diffusion step with a gradient-free teacher prepare
    stage: audio -> (stereo aug) -> MDCT (random phase aug) -> back to raw
    -> mel spec -> frozen DAE recon -> mel_spec_to_linear conditioning
    (reference: ddec_q4_trainer.py:46-145; the ground-truth-conditioned
    ddecmp_p4 variant via ``condition_on_ground_truth=True``,
    reference: ddecmp_p4_trainer.py:102-119).
  * DAE — mel-spec-domain recon training with MSS2D (or randomized-prime
    MSS), decaying point-L1 warmup, recon NLL via learned logvar,
    phase-invariance and dispersion latent regularizers with warmup, and
    KL-to-unit-variance on pre-norm latents
    (reference: dae_p1_trainer.py:228-431; the MDCT-domain m1 variant via
    ``domain="mdct"``, reference: dae_trainer_m1.py:300-491).

All batch preparation (augmentations, format transforms, teachers) runs
inside the jitted step — no host round trips.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mp import normalize
from . import losses as L
from .ema import EMABank
from .optim import normalize_mp_weights
from .train_state import (TrainState, UNetTrainConfig, _find_clip_stat,
                          make_unet_train_step)


def random_stereo_augmentation(key: jax.Array, audio: jnp.ndarray) -> jnp.ndarray:
    """Randomly swap L/R per sample (reference: ddec_q4_trainer.py:36-44).
    audio: (B, C, T)."""
    flip = jax.random.bernoulli(key, 0.5, (audio.shape[0],))
    flipped = jnp.flip(audio, axis=1)
    return jnp.where(flip[:, None, None], flipped, audio)


# ---------------------------------------------------------------------------
# DDEC trainer
# ---------------------------------------------------------------------------

@dataclass
class DDECTrainConfig:
    unet: UNetTrainConfig = field(default_factory=UNetTrainConfig)
    random_stereo_augmentation: bool = True
    random_phase_augmentation: bool = True
    crop_edges: int = 4
    condition_on_ground_truth: bool = False  # ddecmp_p4 variant


def make_ddec_train_step(ddec_apply: Callable, get_logvar: Callable,
                         dae_model, dae_variables, fmt,
                         optimizer: optax.GradientTransformation,
                         ema_bank: Optional[EMABank],
                         config: DDECTrainConfig, total_batch_size: int,
                         dae_get_embeddings: Optional[Callable] = None):
    """DDEC training: the frozen DAE is the conditioning teacher."""
    from ..models.dae import DAE as _DAE
    cfg = config
    c = cfg.crop_edges
    cfg.unet.crop_edges = 0  # cropping happens in prepare

    def prepare(batch, key):
        k_st, k_ph = jax.random.split(key)
        audio = batch["audio"].astype(jnp.float32)
        if cfg.random_stereo_augmentation:
            audio = random_stereo_augmentation(k_st, audio)
        # mdct with random phase augmentation, then back to raw so the
        # training target and the conditioning share the same phases
        mdct = fmt.raw_to_mdct(audio,
                               random_phase_augmentation=cfg.random_phase_augmentation,
                               key=k_ph)
        raw = fmt.mdct_to_raw(mdct)
        mel = fmt.raw_to_mel_spec(raw)

        emb_in = batch.get("audio_embeddings")
        if emb_in is not None and dae_get_embeddings is not None:
            dae_emb = dae_get_embeddings(dae_variables, normalize(emb_in, axis=-1))
        else:
            dae_emb = None

        # width-align the mel to the DAE downsample ratio so decode returns
        # the same width (the reference trains on pre-aligned crops)
        ds = dae_model.downsample_ratio
        mel = mel[:, :, : mel.shape[2] // ds * ds]
        if cfg.condition_on_ground_truth:
            recon_mel = mel  # ddecmp_p4: condition on ground truth mel
        else:
            _, recon_mel, _ = dae_model.apply(dae_variables, mel, dae_emb,
                                              training=False)
        recon_mel = recon_mel[:, :, c:-c] if c > 0 else recon_mel
        lin = fmt.mel_spec_to_linear(recon_mel.astype(jnp.float32))
        mdct_c = mdct[:, :, c:-c] if c > 0 else mdct
        mdct_c = mdct_c[:, :, : lin.shape[2]]
        out = {"samples": mdct_c, "ref_samples": lin}
        if emb_in is not None:
            out["embeddings"] = emb_in
        return out

    def no_embeddings(params, emb_in, mask):
        return None  # ddec has no label embedding (in_channels_emb == 0)

    return make_unet_train_step(ddec_apply, no_embeddings, get_logvar,
                                optimizer, ema_bank, cfg.unet,
                                total_batch_size, prepare_fn=prepare)


# ---------------------------------------------------------------------------
# DAE trainer
# ---------------------------------------------------------------------------

@dataclass
class DAETrainConfig:
    kl_loss_weight: float = 0.01
    kl_mean_weight: float = 1.0
    kl_warmup_steps: int = 20000
    phase_invariance_loss_weight: float = 1.0
    latents_dispersion_loss_weight: float = 0.0
    equivariance_loss_weight: float = 0.0
    latents_regularization_warmup_steps: int = 20000
    point_loss_weight: float = 2.0
    point_loss_warmup_steps: int = 100
    random_stereo_augmentation: bool = True
    crop_edges: int = 4
    grad_accum_steps: int = 1
    domain: str = "mel"               # "mel" (p1) | "mdct" (m1)
    use_random_prime_mss: bool = False
    # fused Pallas MSS2D recon loss (ops/pallas/mss2d.py): faster and ~8x
    # less HBM than the jnp unfold path on TPU (v5e-1 measured); supports
    # midside "stack"/"none" only
    use_fused_mss2d: bool = False
    mss1d_prime_loss_weight: float = 0.0   # m1's prime-width 1D MSS term
    mss2d: L.MSSLoss2DConfig = field(default_factory=L.MSSLoss2DConfig)


def make_dae_train_step(dae_model, fmt, optimizer: optax.GradientTransformation,
                        ema_bank: Optional[EMABank], config: DAETrainConfig,
                        total_batch_size: int,
                        get_embeddings: Optional[Callable] = None):
    """Build the DAE train step over variables = {"params", "stats"}.

    batch: {"audio": (B, C, T), "audio_embeddings": optional}.
    """
    from ..models.dae import DAE as _DAE
    cfg = config
    mss = L.MSSLoss2D(cfg.mss2d)
    c = cfg.crop_edges

    def warmup(step, n):
        if n <= 0:
            return jnp.float32(1.0)
        return jnp.minimum(step / n, 1.0)

    def decay(step, n):
        if n <= 0:
            return jnp.float32(0.0)
        return jnp.maximum(1.0 - step / n, 0.0)

    def loss_fn(params, stats, batch, key, global_step):
        k_st, k_ph, k_drop = jax.random.split(key, 3)
        audio = batch["audio"].astype(jnp.float32)
        if cfg.random_stereo_augmentation:
            audio = random_stereo_augmentation(k_st, audio)

        emb_in = batch.get("audio_embeddings")
        variables = {"params": params, "stats": stats}
        if emb_in is not None:
            dae_emb = dae_model.apply(variables, normalize(emb_in, axis=-1),
                                      method=_DAE.get_embeddings)
        else:
            dae_emb = None

        if cfg.domain == "mel":
            samples = fmt.raw_to_mel_spec(audio)
        else:  # mdct domain (m1 trainer)
            samples = fmt.raw_to_mdct(audio, random_phase_augmentation=True,
                                      key=k_ph)
        samples = samples[:, :, c:-c] if c > 0 else samples
        # align width to the DAE downsample ratio so decode shapes match
        ds = dae_model.downsample_ratio
        w_al = samples.shape[2] // ds * ds
        samples = jax.lax.stop_gradient(samples[:, :, :w_al])

        (latents, recon, pre_norm), new_vars = dae_model.apply(
            variables, samples, dae_emb, training=True, mutable=["stats"])
        latents = latents.astype(jnp.float32)
        pre_norm = pre_norm.astype(jnp.float32)

        # ---- reconstruction losses (per sample) ------------------------
        # MSS2D operates (B, C, H, W): move channels first
        s_cf = jnp.transpose(samples, (0, 3, 1, 2))
        r_cf = jnp.transpose(recon.astype(jnp.float32), (0, 3, 1, 2))
        if cfg.use_random_prime_mss:
            recon_loss = L.random_prime_mss_2d(k_drop, r_cf, s_cf)
        elif cfg.use_fused_mss2d:
            from ..ops.pallas.mss2d import mss2d_loss_fused
            assert cfg.mss2d.use_midside_transform in ("stack", "none")
            recon_loss = mss2d_loss_fused(
                r_cf, s_cf, block_widths=cfg.mss2d.block_widths,
                block_overlap=cfg.mss2d.block_overlap,
                use_midside=cfg.mss2d.use_midside_transform == "stack")
        else:
            recon_loss = mss(r_cf, s_cf)
        if cfg.mss1d_prime_loss_weight > 0:
            # prime-width 1D MSS over the width (time) axis: (B, C*H, W)
            s1 = s_cf.reshape(s_cf.shape[0], -1, s_cf.shape[-1])
            r1 = r_cf.reshape(r_cf.shape[0], -1, r_cf.shape[-1])
            # cap block widths at the signal length
            bws = tuple(b for b, st in zip(L.PRIME_BLOCK_WIDTHS_1D,
                                           L.PRIME_BLOCK_STEPS_1D)
                        if b <= s1.shape[-1])
            sts = L.PRIME_BLOCK_STEPS_1D[:len(bws)]
            recon_loss = recon_loss + L.prime_mss_1d(
                r1, s1, bws, sts) * cfg.mss1d_prime_loss_weight
        point_loss = jnp.mean(jnp.abs(recon - samples), axis=(1, 2, 3))
        pl_w = cfg.point_loss_weight * decay(global_step, cfg.point_loss_warmup_steps)
        recon_loss = recon_loss + point_loss * pl_w

        logvar = dae_model.apply(variables, method=_DAE.get_recon_loss_logvar)
        recon_nll = recon_loss / jnp.exp(logvar) + logvar

        # ---- latent regularizers ----------------------------------------
        reg_w = warmup(global_step, cfg.latents_regularization_warmup_steps)
        total = recon_nll.mean()
        logs: Dict[str, Any] = {"loss_recon": recon_loss.mean(),
                                "loss_point": point_loss.mean(),
                                "recon_loss_logvar": logvar}

        if cfg.phase_invariance_loss_weight > 0:
            mdct2 = fmt.raw_to_mdct(audio, random_phase_augmentation=True,
                                    key=jax.random.fold_in(k_ph, 7))
            # re-encode from a different-phase view of the same audio;
            # for the mel-domain trainer the second view goes through the
            # mel spec of the phase-rotated audio
            if cfg.domain == "mel":
                alt = fmt.raw_to_mel_spec(fmt.mdct_to_raw(mdct2))
            else:
                alt = mdct2
            alt = alt[:, :, c:-c] if c > 0 else alt
            alt = jax.lax.stop_gradient(alt[:, :, :w_al])
            latents2 = dae_model.apply(variables, alt, dae_emb,
                                       method=_DAE.encode)
            pi = L.phase_invariance_loss(latents, latents2.astype(jnp.float32)) / 2.0
            total = total + pi.mean() * cfg.phase_invariance_loss_weight * reg_w
            logs["loss_phase_invariance"] = pi.mean()

        if cfg.latents_dispersion_loss_weight > 0:
            disp = L.latents_dispersion_loss(latents)
            total = total + disp.mean() * cfg.latents_dispersion_loss_weight * reg_w
            logs["loss_dispersion"] = disp.mean()

        if cfg.equivariance_loss_weight > 0:
            # latent shift-equivariance (reference: loss/equivariance.py)
            eq_cfg = L.EquivarianceLossConfig(
                levels=int(np.log2(dae_model.downsample_ratio)) + 1)
            enc = lambda m: dae_model.apply(variables, m, dae_emb,
                                            method=_DAE.encode)
            eq = L.equivariance_loss(jax.random.fold_in(k_drop, 11), enc,
                                     samples, latents.astype(jnp.float32),
                                     eq_cfg)
            total = total + eq.mean() * cfg.equivariance_loss_weight * reg_w
            logs["loss_equivariance"] = eq.mean()

        # KL-to-unit-variance on pre-norm latents (reference :373-383)
        var = jnp.mean(pre_norm ** 2, axis=(0, 1, 2)) + 1e-20
        var_kl = var - 1.0 - jnp.log(var)
        mean_sq = jnp.mean(pre_norm, axis=(0, 1, 2)) ** 2
        kl = var_kl.mean() + mean_sq.mean() * cfg.kl_mean_weight
        kl_w = cfg.kl_loss_weight * warmup(global_step, cfg.kl_warmup_steps)
        total = total + kl * kl_w
        logs["loss_kl"] = kl
        logs["latents_var"] = latents.var()
        logs["latents_mean"] = latents.mean()
        logs["sample_losses"] = recon_loss  # per-sample, for outlier hunting
        return total, (logs, new_vars["stats"])

    accum = cfg.grad_accum_steps

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        rng, step_key = jax.random.split(state.rng)
        params = state.params["params"]
        stats = state.params["stats"]
        gstep = state.global_step.astype(jnp.float32)

        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]), batch)
        keys = jax.random.split(step_key, accum)

        def body(carry, xs):
            grads_acc, loss_acc, stats_c = carry
            mb, k = xs
            (loss, (logs, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats_c, mb, k, gstep)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, new_stats), logs

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        (grads, loss_sum, new_stats), logs_seq = jax.lax.scan(
            body, (zero, 0.0, stats), (micro, keys))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        loss = loss_sum / accum

        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        grad_norm = _find_clip_stat(opt_state, "last_grad_norm")
        params = optax.apply_updates(params, updates)
        params = normalize_mp_weights(params)
        new_variables = {"params": params, "stats": new_stats}

        samples_processed = state.total_samples_processed + total_batch_size
        if ema_bank is not None:
            ema_state, new_variables = ema_bank.update(
                state.ema_state, new_variables, state.total_samples_processed,
                total_batch_size, gstep)
        else:
            ema_state = state.ema_state

        new_state = TrainState(
            params=new_variables, opt_state=opt_state, ema_state=ema_state,
            sigma_pdf=state.sigma_pdf, global_step=state.global_step + 1,
            total_samples_processed=samples_processed, rng=rng)
        logs = {k: (v.reshape(-1) if k == "sample_losses" else v.mean())
                for k, v in logs_seq.items()}
        logs["loss"] = loss
        logs["grad_norm"] = grad_norm
        return new_state, logs

    return train_step


# ---------------------------------------------------------------------------
# joint multi-module training (reference: trainer.py:204-209, 1030-1042 —
# train_modules with more than one module stepping one optimizer)
# ---------------------------------------------------------------------------

@dataclass
class JointDAEDDECConfig:
    dae: DAETrainConfig = field(default_factory=DAETrainConfig)
    ddec: DDECTrainConfig = field(default_factory=DDECTrainConfig)
    dae_loss_weight: float = 1.0
    ddec_loss_weight: float = 1.0
    grad_accum_steps: int = 1


def make_joint_dae_ddec_train_step(dae_model, ddec_apply, ddec_get_logvar,
                                   fmt, optimizer, ema_bank,
                                   config: JointDAEDDECConfig,
                                   total_batch_size: int):
    """Train the DAE and the DDEC together: the DDEC is conditioned on the
    LIVE (trainable) DAE reconstruction, so conditioning-usefulness gradients
    flow into the DAE on top of its own recon losses. State:
      params = {"dae": {"params", "stats"}, "ddec": {...}}.
    """
    from ..models.dae import DAE as _DAE
    from .sigma_sampler import SigmaSampler
    from .train_state import TrainState
    cfg = config
    dae_cfg = cfg.dae
    mss = L.MSSLoss2D(dae_cfg.mss2d)
    sampler = SigmaSampler(cfg.ddec.unet.sigma)
    c = cfg.ddec.crop_edges

    def loss_fn(trainable, dae_stats, batch, sigma, key, global_step):
        k_st, k_ph, k_drop = jax.random.split(key, 3)
        audio = batch["audio"].astype(jnp.float32)
        if cfg.ddec.random_stereo_augmentation:
            audio = random_stereo_augmentation(k_st, audio)
        mdct = fmt.raw_to_mdct(audio,
                               random_phase_augmentation=cfg.ddec.random_phase_augmentation,
                               key=k_ph)
        raw = jax.lax.stop_gradient(fmt.mdct_to_raw(mdct))
        mel = fmt.raw_to_mel_spec(raw)
        ds = dae_model.downsample_ratio
        mel = jax.lax.stop_gradient(mel[:, :, : mel.shape[2] // ds * ds])

        dae_vars = {"params": trainable["dae"], "stats": dae_stats}
        (latents, recon_mel, pre_norm), new_vars = dae_model.apply(
            dae_vars, mel, None, training=True, mutable=["stats"])

        # ---- dae losses (subset of make_dae_train_step) ----------------
        s_cf = jnp.transpose(mel, (0, 3, 1, 2))
        r_cf = jnp.transpose(recon_mel.astype(jnp.float32), (0, 3, 1, 2))
        recon_loss = mss(r_cf, s_cf)
        logvar = dae_model.apply(dae_vars, method=_DAE.get_recon_loss_logvar)
        dae_loss = (recon_loss / jnp.exp(logvar) + logvar).mean()
        var = jnp.mean(pre_norm.astype(jnp.float32) ** 2, axis=(0, 1, 2)) + 1e-20
        kl = (var - 1.0 - jnp.log(var)).mean()
        dae_loss = dae_loss + kl * dae_cfg.kl_loss_weight * jnp.minimum(
            global_step / max(dae_cfg.kl_warmup_steps, 1), 1.0)

        # ---- ddec diffusion loss conditioned on the live recon ----------
        recon_c = recon_mel[:, :, c:-c] if c > 0 else recon_mel
        lin = fmt.mel_spec_to_linear(recon_c.astype(jnp.float32))
        mdct_c = mdct[:, :, c:-c] if c > 0 else mdct
        mdct_c = jax.lax.stop_gradient(mdct_c[:, :, : lin.shape[2]])
        sig = sigma.reshape((-1,) + (1,) * (mdct_c.ndim - 1))
        noise = jax.random.normal(jax.random.fold_in(key, 3), mdct_c.shape) * sig
        denoised = ddec_apply(trainable["ddec"], mdct_c + noise, sigma, None,
                              lin, k_drop)
        sd = cfg.ddec.unet.sigma.sigma_data
        weight = (sig ** 2 + sd ** 2) / (sig * sd) ** 2
        w_loss = (((denoised - mdct_c) ** 2) * weight).mean(
            axis=tuple(range(1, mdct_c.ndim)))
        dd_logvar = ddec_get_logvar(trainable["ddec"], sigma).reshape(-1)
        ddec_loss = (w_loss / jnp.exp(dd_logvar) + dd_logvar).mean()

        total = dae_loss * cfg.dae_loss_weight + ddec_loss * cfg.ddec_loss_weight
        return total, {"loss_dae": dae_loss, "loss_ddec": ddec_loss,
                       "stats": new_vars["stats"]}

    accum = cfg.grad_accum_steps

    def train_step(state: TrainState, batch):
        rng, step_key, sigma_key = jax.random.split(state.rng, 3)
        gstep = state.global_step.astype(jnp.float32)
        global_sigma = sampler.sample(sigma_key, total_batch_size,
                                      state.sigma_pdf)
        trainable = {"dae": state.params["dae"]["params"],
                     "ddec": state.params["ddec"]}
        dae_stats = state.params["dae"]["stats"]
        device_batch = jax.tree_util.tree_leaves(batch)[0].shape[0]

        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
            batch)
        sig_micro = global_sigma[:device_batch].reshape(accum, -1)
        keys = jax.random.split(step_key, accum)

        def body(carry, xs):
            grads_acc, loss_acc, stats_c = carry
            mb, sg, k = xs
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, stats_c, mb, sg, k, gstep)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, aux["stats"]), \
                (aux["loss_dae"], aux["loss_ddec"])

        zero = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        (grads, loss_sum, new_stats), (ld, ldd) = jax.lax.scan(
            body, (zero, 0.0, dae_stats), (micro, sig_micro, keys))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        grad_norm = _find_clip_stat(opt_state, "last_grad_norm")
        new_trainable = optax.apply_updates(trainable, updates)
        new_trainable = normalize_mp_weights(new_trainable)
        new_params = {"dae": {"params": new_trainable["dae"],
                              "stats": new_stats},
                      "ddec": new_trainable["ddec"]}

        samples = state.total_samples_processed + total_batch_size
        if ema_bank is not None:
            ema_state, new_params = ema_bank.update(
                state.ema_state, new_params, state.total_samples_processed,
                total_batch_size, gstep)
        else:
            ema_state = state.ema_state
        new_state = TrainState(params=new_params, opt_state=opt_state,
                               ema_state=ema_state, sigma_pdf=state.sigma_pdf,
                               global_step=state.global_step + 1,
                               total_samples_processed=samples, rng=rng)
        return new_state, {"loss": loss_sum / accum, "grad_norm": grad_norm,
                           "loss_dae": ld.mean(),
                           "loss_ddec": ldd.mean()}

    return train_step
