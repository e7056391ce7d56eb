"""The EDM sampler loop as a single jitted ``lax.scan``.

Capability parity with the reference's sampling loops
(reference: src/pipelines/dual_diffusion_pipeline.py:350-752):

  * CFG via doubled batch and ``uncond.lerp(cond, cfg_scale)`` (:488,700-703)
  * optional 2nd-order Heun correction (:504-516,705-721)
  * "added noise in sampling": cosh-shaped effective input perturbation
    shrinks sigma_next, then noise sqrt(old^2 - new^2) is re-added
    (:493-529,682-737)
  * per-step re-normalization to the expected std (:531)
  * seamless-loop generation on a torus: per-step random roll + fixed
    32-column circular pad (:467-474,651-658), final crossfade blend
    (:573-582)
  * img2img init and inpainting reference channels (:427-447)
  * stereo-fix noise correlation (:638-641)

TPU-first design: every per-step scalar (sigma_curr, sigma_next before/after
perturbation, lerp t, re-added noise amplitude, renorm target) is precomputed
host-side into scan-carried arrays, so the loop body is shape-static and the
whole sampler jits once. The reference's per-step roll+pad (dynamic shapes)
becomes a traced roll + fixed-width circular pad.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mp import mp_sum, normalize
from .schedule import get_schedule


@dataclass
class SampleParams:
    """Sampling parameters (reference: dual_diffusion_pipeline.py:48-101)."""
    steps: int = 100
    seed: Optional[int] = None
    batch_size: int = 1
    length: Optional[int] = None

    cfg_scale: float = 1.5
    sigma_max: Optional[float] = None
    sigma_min: Optional[float] = None
    sigma_data: Optional[float] = None
    schedule: str = "edm2"
    rho: float = 7.0

    use_heun: bool = True
    input_perturbation: float = 1.0
    input_perturbation_offset: float = 0.0
    # "cosh": the __call__ variant (ref :493-501) with per-step renorm;
    # "tanh": the live diffusion_decode variant (ref :682-697), no renorm
    perturbation_shape: str = "cosh"
    renormalize_per_step: Optional[bool] = None   # default: shape == "cosh"
    init_noise_mode: str = "sigma_max"            # or "sigma_plus_data"
    # production FGLA decode default: phase-locked SPSI init at 100
    # iterations — on mel-INVERTED magnitudes (the decode input) it
    # measured conv_err 0.054 vs flat@200's 0.081 at the SAME TPU wall
    # clock (BASELINE.md r4; VERDICT r4 #6). The bench default stays
    # flat@200 (the reference workload definition,
    # /root/reference/src/modules/formats/old/spectrogram.py:71-74).
    num_fgla_iters: int = 100
    fgla_phase_init: Optional[str] = "spsi"       # None = format config

    img2img_strength: float = 0.5
    seamless_loop: bool = False
    stereo_fix: float = 0.0        # noise correlation between stereo channels

    prompt: Dict[str, float] = field(default_factory=dict)


LOOP_PAD = 32  # seamless-loop circular pad columns (reference :655-658)


def _per_step_constants(params: SampleParams, sigma_max: float, sigma_min: float,
                        sigma_data: float):
    """Precompute all per-step scalars host-side (float64)."""
    sched = get_schedule(params.schedule, params.steps, sigma_max=sigma_max,
                         sigma_min=sigma_min, rho=params.rho)
    sigma_curr = sched[:-1].astype(np.float64)
    sigma_next_sched = sched[1:].astype(np.float64)

    if params.perturbation_shape == "cosh":
        eff = params.input_perturbation * (
            1.0 - 1.0 / np.cosh(np.log(sigma_next_sched * sigma_curr) / 2.0
                                + params.input_perturbation_offset)) ** 2
    elif params.perturbation_shape == "tanh":
        ipo = np.log(sigma_curr) + params.input_perturbation_offset
        eff = (np.tanh(ipo) / 2.0 + 0.5) * params.input_perturbation
    else:
        raise ValueError(f"unknown perturbation_shape {params.perturbation_shape}")
    eff = np.clip(eff, 0.0, 1.0)
    old_sigma_next = sigma_next_sched.copy()
    sigma_next = sigma_next_sched * (1.0 - eff)

    n = params.steps
    t_lerp = np.where(np.arange(n) + 1 < n, sigma_next / sigma_curr, 0.0)
    sigma_hat = np.maximum(old_sigma_next, sigma_min)
    t_hat = sigma_hat / sigma_curr
    readd = np.where(np.arange(n) + 1 < n,
                     np.sqrt(np.maximum(old_sigma_next ** 2 - sigma_next ** 2, 0.0)),
                     0.0)
    renorm = np.sqrt(old_sigma_next ** 2 + sigma_data ** 2)
    return {k: jnp.asarray(v, jnp.float32) for k, v in dict(
        sigma_curr=sigma_curr, sigma_next=sigma_next, t_lerp=t_lerp,
        sigma_hat=sigma_hat, t_hat=t_hat, readd=readd, renorm=renorm).items()}, sched


def _circular_pad_w(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Fixed-width circular pad on the time axis (axis -2 of NHWC);
    wrap mode handles pad widths larger than the axis."""
    padw = [(0, 0)] * x.ndim
    padw[-2] = (pad, pad)
    return jnp.pad(x, padw, mode="wrap")


def edm_sample(denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
               sample_shape: Tuple[int, ...],
               params: SampleParams,
               sigma_max: float, sigma_min: float, sigma_data: float,
               key: jax.Array,
               init_sample: Optional[jnp.ndarray] = None,
               init_noise: Optional[jnp.ndarray] = None,
               return_debug: bool = True,
               use_cfg: bool = True,
               x_ref: Optional[jnp.ndarray] = None,
               chunk_size: Optional[int] = None,
               chunk_callback: Optional[Callable[[int, jnp.ndarray], bool]] = None):
    """Run the EDM sampler.

    denoise_fn(x_doubled, sigma_doubled) -> D_x doubled-batch output; the
    caller closes over unet params, CFG embeddings (cond first half, uncond
    second half) and any x_ref conditioning, and handles the seamless-loop
    circular pad columns if present.

    ``x_ref``: reference conditioning (already CFG-doubled when use_cfg)
    passed per step as denoise_fn(x, sigma, ref) — needed when the ref
    must follow the seamless-loop roll+pad of the sample
    (reference: dual_diffusion_pipeline.py:467-474).

    sample_shape: (B, H, W, C) (latent or spectrogram space).
    Returns (sample, debug) where sample is normalized to sigma_data.

    ``chunk_size``/``chunk_callback``: run the scan in host-visible chunks
    of N steps; after each chunk ``chunk_callback(steps_done, sample)`` is
    called — return True to abort (the reference's per-step preview/abort
    channel, dual_diffusion_pipeline.py:540-546, at chunk granularity —
    a single jitted scan cannot early-exit).
    """
    consts, sched = _per_step_constants(params, sigma_max, sigma_min, sigma_data)
    b = sample_shape[0]

    # jit the model call so Heun's second call per step REUSES the traced
    # jaxpr (pjit callee cache) instead of retracing the full UNet — at
    # ref scale the duplicate trace was ~half the sampler's lowering time,
    # the dominant warm-start term (BASELINE r4 breakdown; VERDICT r4 #3).
    # XLA inlines the inner pjit, so the compiled graph is unchanged.
    denoise_fn = jax.jit(denoise_fn)

    key, nk = jax.random.split(key)
    # init_noise: caller-supplied x_T noise (determinism / cross-impl
    # parity tests); default draws from the key
    noise = (init_noise.astype(jnp.float32) if init_noise is not None
             else _draw_noise(nk, sample_shape, params.stereo_fix))
    if params.init_noise_mode == "sigma_plus_data":
        init_scale = float(np.sqrt(sched[0] ** 2 + sigma_data ** 2))
    else:
        init_scale = float(sched[0])
    skip_steps = 0
    if init_sample is not None:
        # img2img: enter the schedule mid-way — skip (1 - strength) of the
        # steps and noise the init sample to the entry sigma. strength=1 is
        # the reference __call__ init (noise*sigma_max + input*sigma_data,
        # dual_diffusion_pipeline.py:464-465); strength->0 reproduces the
        # input (only the final sigma_min-scale noise is added).
        strength = float(np.clip(params.img2img_strength, 0.0, 1.0))
        skip_steps = params.steps - int(round(params.steps * strength))
        if skip_steps > 0:
            init_scale = float(sched[skip_steps])
        sample = noise * init_scale + init_sample.astype(jnp.float32) * sigma_data
    else:
        sample = noise * init_scale
    renorm_steps = (params.renormalize_per_step
                    if params.renormalize_per_step is not None
                    else params.perturbation_shape == "cosh")

    def step(carry, xs):
        sample, key = carry
        sc, sn, tl, sh, th, ra, rn = xs
        key, k_noise, k_shift = jax.random.split(key, 3)

        ref = x_ref
        if params.seamless_loop:
            shift = jax.random.randint(k_shift, (), 0, sample.shape[-2])
            rolled = jnp.roll(sample, shift, axis=-2)
            x = _circular_pad_w(rolled, LOOP_PAD)
            if ref is not None:  # the ref rides the same torus shift
                ref = _circular_pad_w(jnp.roll(ref, shift, axis=-2), LOOP_PAD)
        else:
            x = sample

        def call_model(x_in, sig):
            if ref is None:
                return denoise_fn(x_in, sig)
            return denoise_fn(x_in, sig, ref)

        def run_model(x_in, sigma_val):
            """One (possibly CFG-doubled) model call + guidance blend.
            Without CFG the batch is NOT doubled (reference
            diffusion_decode :661-666 skips doubling when unconditional)."""
            if use_cfg:
                x2 = jnp.concatenate([x_in, x_in], axis=0)
                sig2 = jnp.full((2 * b,), sigma_val, jnp.float32)
                out = call_model(x2, sig2).astype(jnp.float32)
                return out[b:] + (out[:b] - out[b:]) * params.cfg_scale
            sig1 = jnp.full((b,), sigma_val, jnp.float32)
            return call_model(x_in, sig1).astype(jnp.float32)

        cfg_out = run_model(x, sc)

        if params.use_heun:
            x_hat = cfg_out + (x - cfg_out) * th
            cfg_hat = run_model(x_hat, sh)
            cfg_out = 0.5 * (cfg_out + cfg_hat)

        new = cfg_out + (x - cfg_out) * tl

        if params.seamless_loop:
            new = jnp.roll(new[..., LOOP_PAD:-LOOP_PAD, :], -shift, axis=-2)
            cfg_dbg = jnp.roll(cfg_out[..., LOOP_PAD:-LOOP_PAD, :], -shift, axis=-2)
        else:
            cfg_dbg = cfg_out

        new = new + _draw_noise(k_noise, sample_shape, params.stereo_fix) * ra
        if renorm_steps:
            new = normalize(new) * rn

        dbg = {"sample_std": jnp.std(new), "cfg_output_mean": jnp.mean(cfg_dbg),
               "cfg_output_std": jnp.std(cfg_dbg)}
        return (new, key), dbg

    xs = (consts["sigma_curr"], consts["sigma_next"], consts["t_lerp"],
          consts["sigma_hat"], consts["t_hat"], consts["readd"], consts["renorm"])
    xs = tuple(x[skip_steps:] for x in xs)
    run_steps = params.steps - skip_steps
    if run_steps == 0:
        dbg = {}
    elif chunk_size is None or chunk_size >= run_steps:
        (sample, _), dbg = jax.lax.scan(step, (sample, key), xs)
    else:
        # hoist the step's closure (model params, embeddings, x_ref) into
        # explicit jit arguments: a closed-over param tree would be baked
        # into the HLO as constants, which XLA constant-folds at compile
        # time (pathologically slow at large model scales)
        xs_example = tuple(x[0] for x in xs)  # scan slices xs per step
        step_conv, consts = jax.closure_convert(step, (sample, key),
                                                xs_example)
        run_chunk = jax.jit(lambda carry, xs_c, cs: jax.lax.scan(
            lambda c, x: step_conv(c, x, *cs), carry, xs_c))
        carry = (sample, key)
        dbg_parts = []
        done = 0
        while done < run_steps:
            n = min(chunk_size, run_steps - done)
            xs_c = tuple(x[done:done + n] for x in xs)
            carry, d = run_chunk(carry, xs_c, consts)
            dbg_parts.append(d)
            done += n
            if chunk_callback is not None and chunk_callback(done, carry[0]):
                break
        sample = carry[0]
        dbg = jax.tree_util.tree_map(lambda *a: jnp.concatenate(a), *dbg_parts)
    sample = normalize(sample) * sigma_data

    debug = {"sigma_schedule": np.asarray(sched)}
    if return_debug:
        debug.update({k: v for k, v in dbg.items()})
    return sample, debug


def _draw_noise(key: jax.Array, shape: Tuple[int, ...], stereo_fix: float) -> jnp.ndarray:
    """Gaussian noise with optional stereo correlation
    (reference: dual_diffusion_pipeline.py:638-641): copy channel 1 into
    channel 0 (fully correlated) then mp_sum fresh noise toward it with
    t = stereo_fix — magnitude-preserving by construction."""
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, shape, jnp.float32)
    if stereo_fix > 0 and shape[-1] >= 2:
        corr = jnp.broadcast_to(noise[..., 1:2], noise.shape)
        fresh = jax.random.normal(k2, shape, jnp.float32)
        noise = mp_sum(fresh, corr, t=stereo_fix)
    return noise


def seamless_loop_crossfade(raw: jnp.ndarray, hop_length: int,
                            exponent: float = 2.0 / 3.0) -> jnp.ndarray:
    """Final crossfade blend for seamless-loop audio
    (reference: dual_diffusion_pipeline.py:573-582)."""
    loop_padding = int((LOOP_PAD - 0.5) * hop_length) * 2
    w = jnp.arange(loop_padding, dtype=jnp.float32) / loop_padding
    blended = (raw[..., -loop_padding:] * (1 - w) ** exponent
               + raw[..., :loop_padding] * w ** exponent)
    core = raw[..., loop_padding // 2: -loop_padding // 2]
    out = core.at[..., : loop_padding // 2].set(blended[..., -loop_padding // 2:])
    out = out.at[..., -loop_padding // 2:].set(blended[..., : loop_padding // 2])
    return out
