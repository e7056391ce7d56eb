"""Pipeline: the named-module container with on-disk model directories.

Capability parity with the reference's DualDiffusionPipeline
(reference: src/pipelines/dual_diffusion_pipeline.py:126-752):

  * a model directory ``<model>/`` holds ``model_index.json`` (module name ->
    registered type + config class) and one subfolder per module with
    ``<module>.json`` + ``<module>.safetensors``
    (reference: src/modules/module.py:59-99).
  * module classes come from an explicit registry instead of importlib of
    arbitrary class paths (SURVEY.md §7.1 safety note).
  * checkpoint inventory discovery (``<module>_checkpoint-<step>/``) and EMA
    inventory (``ema_*.safetensors``, ``<module>_ema_archive/``)
    (reference: dual_diffusion_pipeline.py:190-215).
  * ``from_pretrained(..., load_ema=...)`` loads EMA weights in place of
    train weights, including post-hoc reconstruction from an archive
    (reference: src/modules/module.py:151-174).
  * sampling orchestration: ``diffusion_decode`` (latent EDM sampling) and
    the full ``generate`` (latents -> DAE decode -> FGLA or DDEC -> audio)
    (reference: dual_diffusion_pipeline.py:350-752).

Flax param pytrees are stored flattened with '/'-joined keys in safetensors.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import (config_from_dict, config_to_dict, load_json,
                     load_safetensors, save_json, save_safetensors)

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_MODULE_REGISTRY: Dict[str, Tuple[Callable, type]] = {}


def register_module(name: str, factory: Callable, config_class: type) -> None:
    """Register a module type: factory(config) -> flax module (or format)."""
    _MODULE_REGISTRY[name] = (factory, config_class)


def get_module_class(name: str) -> Tuple[Callable, type]:
    if name not in _MODULE_REGISTRY:
        raise KeyError(f"unknown module type '{name}'; known: {sorted(_MODULE_REGISTRY)}")
    return _MODULE_REGISTRY[name]


def _register_builtins() -> None:
    from ..models.dae import DAE, DAEConfig
    from ..models.unet import UNet, UNetConfig
    from ..models.vae import VAE, VAEConfig
    from ..models.discriminator import Discriminator, DiscriminatorConfig
    from ..models import formats as _formats_pkg  # populate the registry
    from ..models.formats.format import _FORMAT_REGISTRY
    register_module("unet", lambda cfg: UNet(cfg), UNetConfig)
    register_module("ddec", lambda cfg: UNet(cfg), UNetConfig)
    register_module("dae", lambda cfg: DAE(cfg), DAEConfig)
    register_module("vae", lambda cfg: VAE(cfg), VAEConfig)
    register_module("disc", lambda cfg: Discriminator(cfg), DiscriminatorConfig)
    for fname, (cls, cfg_cls) in _FORMAT_REGISTRY.items():
        register_module(f"format:{fname}", (lambda c=cls: (lambda cfg: c(cfg)))(), cfg_cls)


_register_builtins()


# ---------------------------------------------------------------------------
# flat param <-> safetensors
# ---------------------------------------------------------------------------

def _flatten(variables) -> Dict[str, np.ndarray]:
    """Flatten a variables pytree to '/'-joined keys. Scalar () params are
    stored as shape (1,) (safetensors requirement) with a '#0d' key suffix
    marking them for exact restoration."""
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(jax.tree_util.tree_map(np.asarray, variables), sep="/")
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k + "#0d"] = v.reshape(1)
        else:
            out[k] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    from flax.traverse_util import unflatten_dict
    fixed = {}
    for k, v in flat.items():
        if k.endswith("#0d"):
            fixed[k[:-3]] = np.asarray(v).reshape(())
        else:
            fixed[k] = v
    return jax.tree_util.tree_map(jnp.asarray,
                                  unflatten_dict({tuple(k.split("/")): v
                                                  for k, v in fixed.items()}))


def save_module(path: Union[str, Path], name: str, module_type: str,
                config, variables: Optional[Any],
                last_global_step: int = 0) -> None:
    """Write ``<path>/<name>/<name>.json`` + ``<name>.safetensors``."""
    d = Path(path) / name
    d.mkdir(parents=True, exist_ok=True)
    cfg = config_to_dict(config)
    cfg["__module_type__"] = module_type
    cfg["__last_global_step__"] = last_global_step
    save_json(cfg, d / f"{name}.json")
    if variables is not None:
        save_safetensors(_flatten(variables), d / f"{name}.safetensors")


def load_module(path: Union[str, Path], name: str,
                load_ema: Optional[str] = None):
    """-> (module_type, config, variables_or_None)."""
    d = Path(path) / name
    raw = load_json(d / f"{name}.json")
    module_type = raw.pop("__module_type__")
    raw.pop("__last_global_step__", None)
    _, cfg_cls = get_module_class(module_type)
    config = config_from_dict(cfg_cls, raw)
    variables = None
    weights = d / f"{name}.safetensors"
    if load_ema:
        # load_ema may arrive from the web UI's /api/load_model POST —
        # reject path separators so the selection cannot traverse out of
        # the module directory (same hardening as checkpoint selections)
        if re.search(r"[/\\\0]|\.\.", load_ema):
            raise ValueError(f"invalid EMA selection {load_ema!r}")
        ema_path = d / f"ema_{load_ema}.safetensors"
        if ema_path.is_file():
            weights = ema_path
        else:
            # post-hoc EMA: "phema_<std>" synthesizes from the archive
            m = re.match(r"phema_([0-9.]+)", load_ema)
            if m and (d / "ema_archive").is_dir():
                from ..training.ema import reconstruct_phema
                flat = reconstruct_phema(float(m.group(1)), str(d / "ema_archive"))
                return module_type, config, _unflatten(flat)
            raise FileNotFoundError(f"no EMA '{load_ema}' for module '{name}' in {d}")
    if weights.is_file():
        variables = _unflatten(load_safetensors(weights))
    return module_type, config, variables


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

@dataclass
class ModuleHandle:
    name: str
    module_type: str
    config: Any
    module: Any            # flax module (or Format instance)
    variables: Optional[Any] = None
    device: Optional[Any] = None   # committed placement, set by Pipeline.to


class Pipeline:
    """Named-module container + generation orchestration."""

    def __init__(self, modules: Dict[str, ModuleHandle],
                 dataset_embeddings: Optional[Dict[str, np.ndarray]] = None):
        self.modules = modules
        self.dataset_embeddings = dataset_embeddings or {}
        self.mesh = None  # set by shard(); None = single-device placement
        # per-stage jitted callables (keyed by stage name): every module /
        # format apply in the serving path must run under jit — eager flax
        # apply dispatches per-op, which is pathological on remote TPU
        # runtimes (and slow everywhere at these model sizes)
        self._jit_cache: Dict[str, Any] = {}
        # inference-folded param trees per module (weights pre-divided by
        # sqrt(fan_in), bf16) — keyed on the variables object identity so
        # a checkpoint/EMA swap from the model explorer re-folds
        self._fold_cache: Dict[str, Any] = {}

    def _folded_variables(self, name: str, h: "ModuleHandle"):
        """Inference-folded (bf16, fan-in-scaled) variables for a module
        — OPT-IN via DD_FOLD_PARAMS=1; returns ``h.variables`` untouched
        otherwise.

        Folding outside the sampling scan keeps every weight loop-
        invariant, but on v5e it measured SLOWER for the big-UNet sampler
        (5.24 s folded vs 3.78 s unfolded at ref scale): the Pallas
        grouped-conv weight transpose loses its multiply+convert fusion
        and lowers to per-step sync retile copies (BASELINE r4). The
        original f32 tree on ``h.variables`` stays untouched (state-dict
        and save paths read it)."""
        from ..models.layers import fold_env_mode, fold_inference_params
        mode = fold_env_mode()
        if mode is None:
            return h.variables
        ent = self._fold_cache.get(name)
        if ent is None or ent[0] is not h.variables:
            folded = jax.jit(lambda v: fold_inference_params(
                v, linear_only=mode == "linear"))(h.variables)
            self._fold_cache[name] = (h.variables, folded)
            return folded
        return ent[1]

    @staticmethod
    def _fold_ctx():
        """Context marking apply calls on _folded_variables trees
        (layers.folded_params); a nullcontext when folding is off."""
        from ..models.layers import fold_ctx, fold_env_mode
        return fold_ctx(fold_env_mode())

    def _jitted(self, name: str, fn):
        """Cache a jitted stage callable; params/inputs stay ARGUMENTS so
        weight trees are never baked into the HLO as constants."""
        f = self._jit_cache.get(name)
        if f is None:
            f = jax.jit(fn)
            self._jit_cache[name] = f
        return f

    def __getattr__(self, name: str):
        modules = self.__dict__.get("modules", {})
        if name in modules:
            return modules[name]
        raise AttributeError(name)

    @property
    def format(self):
        for h in self.modules.values():
            if h.module_type.startswith("format:"):
                return h.module
        return None

    # ---- device placement ------------------------------------------------
    def to(self, device: Optional[Any] = None,
           device_map: Optional[Dict[str, Any]] = None) -> "Pipeline":
        """Commit each module's variables to a device.

        ``device`` places every module; ``device_map`` overrides per module
        name. Devices may be ``jax.Device`` objects or platform strings
        ("tpu", "cpu:1"). Heterogeneous maps reproduce the reference's
        per-module placement (reference:
        src/pipelines/dual_diffusion_pipeline.py:139-166 — e.g. offloading
        the VAE to CPU while the UNet samples on the accelerator): jitted
        stages run on whichever device their committed arguments live on.
        """
        def resolve(d):
            if d is None or not isinstance(d, str):
                return d
            platform, _, idx = d.partition(":")
            return jax.devices(platform)[int(idx) if idx else 0]

        base = resolve(device)
        overrides = {k: resolve(v) for k, v in (device_map or {}).items()}
        for name, h in self.modules.items():
            dev = overrides.get(name, base)
            if dev is not None and h.variables is not None:
                h.variables = jax.device_put(h.variables, dev)
                h.device = dev
        return self

    def shard(self, model_axis: int, devices: Optional[Any] = None
              ) -> "Pipeline":
        """Tensor-parallel placement over a device mesh (multi-chip
        serving).

        Shards every module's weights out-channel-wise over a
        ``model_axis``-wide mesh axis (``parallel.param_sharding_rule`` —
        the same rule the trainer uses), so the jitted sampler/decode
        stages in :meth:`generate` run under GSPMD with XLA-inserted
        collectives. Exactness vs the replicated run is asserted by
        tests/test_parallel.py::test_tensor_parallel_sampler_matches_replicated
        and the __graft_entry__ dryrun's tp-inference leg. The reference
        has no analog (single-GPU serving only,
        src/pipelines/dual_diffusion_pipeline.py:139-166).
        """
        from ..parallel import MeshConfig, make_mesh, shard_train_state
        if devices is None:
            devices = jax.devices()[:model_axis]
        mesh = make_mesh(MeshConfig(data_axis=1, model_axis=model_axis),
                         devices=devices)
        for h in self.modules.values():
            if h.variables is not None:
                h.variables = shard_train_state(mesh, h.variables)
        self.mesh = mesh
        return self

    # ---- io ------------------------------------------------------------
    def save_pretrained(self, model_path: Union[str, Path],
                        last_global_step: int = 0) -> None:
        model_path = Path(model_path)
        model_path.mkdir(parents=True, exist_ok=True)
        index = {"modules": {h.name: h.module_type for h in self.modules.values()},
                 "framework": "dualdiffusion_tpu"}
        save_json(index, model_path / "model_index.json")
        for h in self.modules.values():
            save_module(model_path, h.name, h.module_type, h.config,
                        h.variables, last_global_step)
        if self.dataset_embeddings:
            save_safetensors({k: np.asarray(v) for k, v in self.dataset_embeddings.items()},
                             model_path / "dataset_embeddings.safetensors")

    @classmethod
    def from_pretrained(cls, model_path: Union[str, Path],
                        load_checkpoints: Union[bool, Dict[str, str]] = False,
                        load_emas: Optional[Dict[str, str]] = None) -> "Pipeline":
        """Load a pipeline from a model directory.

        ``load_checkpoints`` selects per-module weight sources (the
        reference UI's Model Explorer checkpoint picker,
        dual_diffusion_pipeline.py:190-215 + nicegui_app.py:84-221):
        ``False`` loads the model root; ``True`` loads each module's
        latest checkpoint; a dict maps module name -> selection, where a
        selection of ``"latest"`` picks the newest checkpoint, ``"root"``/
        ``""``/``None`` the model root, a step number or full
        ``<module>_checkpoint-<step>`` directory name a specific one.
        ``load_emas`` maps module name -> EMA name (or ``phema_<std>`` for
        post-hoc reconstruction); the EMA is resolved inside the module's
        selected source directory.
        """
        model_path = Path(model_path)
        index = load_json(model_path / "model_index.json")
        load_emas = load_emas or {}
        modules: Dict[str, ModuleHandle] = {}
        for name, module_type in index["modules"].items():
            get_module_class(module_type)  # fail fast on unknown types
            src = model_path
            sel = (load_checkpoints.get(name)
                   if isinstance(load_checkpoints, dict)
                   else ("latest" if load_checkpoints else None))
            if sel not in (None, "", "root"):
                if sel == "latest":
                    ckpt = cls.get_latest_checkpoint(model_path, name)
                else:
                    cand = str(sel)
                    if cand.isdigit():
                        cand = f"{name}_checkpoint-{cand}"
                    # the selection may arrive from the web UI's
                    # /api/load_model POST: accept only the module's own
                    # `<module>_checkpoint-<step>` names (no path
                    # separators / traversal out of the model directory —
                    # ADVICE r4 low)
                    if not re.fullmatch(
                            rf"{re.escape(name)}_checkpoint-\d+", cand):
                        raise ValueError(
                            f"invalid checkpoint selection {sel!r} for "
                            f"module '{name}': expected 'latest', 'root', "
                            f"a step number, or '{name}_checkpoint-<step>'")
                    ckpt = model_path / cand
                    if not ckpt.is_dir():
                        raise FileNotFoundError(
                            f"no checkpoint '{sel}' for module '{name}' "
                            f"in {model_path}")
                if ckpt is not None:
                    src = ckpt
            module_type_l, config, variables = load_module(
                src, name, load_ema=load_emas.get(name))
            factory, _ = get_module_class(module_type_l)
            modules[name] = ModuleHandle(name, module_type_l, config,
                                         factory(config), variables)
        emb_path = model_path / "dataset_embeddings.safetensors"
        dataset_embeddings = load_safetensors(emb_path) if emb_path.is_file() else {}
        return cls(modules, dataset_embeddings)

    # ---- inventory (reference: dual_diffusion_pipeline.py:190-215) -------
    @staticmethod
    def get_checkpoints(model_path: Union[str, Path], module_name: str) -> List[Path]:
        model_path = Path(model_path)
        pat = re.compile(rf"^{re.escape(module_name)}_checkpoint-(\d+)$")
        out = []
        if model_path.is_dir():
            for p in model_path.iterdir():
                m = pat.match(p.name)
                if m and p.is_dir():
                    out.append((int(m.group(1)), p))
        return [p for _, p in sorted(out)]

    @classmethod
    def get_latest_checkpoint(cls, model_path, module_name) -> Optional[Path]:
        ckpts = cls.get_checkpoints(model_path, module_name)
        return ckpts[-1] if ckpts else None

    @staticmethod
    def get_available_emas(model_path: Union[str, Path], module_name: str) -> List[str]:
        d = Path(model_path) / module_name
        if not d.is_dir():
            return []
        return sorted(p.name[len("ema_"):-len(".safetensors")]
                      for p in d.iterdir()
                      if p.name.startswith("ema_") and p.name.endswith(".safetensors"))

    # ---- prompt -> embedding (reference :399-420) -------------------------
    def get_prompt_embedding(self, prompt: Dict[str, float]) -> Optional[jnp.ndarray]:
        """Weighted sum of per-label dataset audio+text embeddings,
        normalized; falls back to None if no dataset embeddings exist."""
        if not self.dataset_embeddings:
            return None
        dim = None
        total = None
        for label, weight in prompt.items():
            for kind in ("audio", "text"):
                k = f"{label}_{kind}"
                if k in self.dataset_embeddings:
                    v = jnp.asarray(self.dataset_embeddings[k], jnp.float32) * weight
                    total = v if total is None else total + v
        if total is None:
            ua = self.dataset_embeddings.get("_unconditional_audio")
            if ua is None:
                return None
            total = jnp.asarray(ua, jnp.float32)
        from ..models.mp import normalize
        return normalize(total.reshape(1, -1), axis=-1)

    # ---- generation -------------------------------------------------------
    def diffusion_decode(self, params, key: jax.Array,
                         sample_shape: Optional[Tuple[int, ...]] = None,
                         audio_embedding: Optional[jnp.ndarray] = None,
                         x_ref: Optional[jnp.ndarray] = None,
                         module_name: str = "unet",
                         init_sample: Optional[jnp.ndarray] = None,
                         inpainting_mask: Optional[jnp.ndarray] = None,
                         chunk_size=None, chunk_callback=None):
        """Latent (or conditioned) EDM sampling with the named UNet module
        (reference: dual_diffusion_pipeline.py:589-752).

        inpainting_mask: (B, H, W, 1) (or broadcastable), 1 = generate,
        0 = keep from ``init_sample``. When given, the dedicated
        ``unet_inpainting`` module is substituted if present
        (reference :356-360) and the reference+mask channels are
        concatenated per step (reference :440-447).
        """
        from ..sampling import edm_sample
        if (inpainting_mask is not None and module_name == "unet"
                and "unet_inpainting" in self.modules):
            module_name = "unet_inpainting"
        h = self.modules[module_name]
        unet, ucfg = h.module, h.config
        uvars = self._folded_variables(module_name, h)
        if h.device is not None:
            # heterogeneous placement: stage inputs follow the module
            x_ref, init_sample, inpainting_mask, audio_embedding = (
                jax.device_put(t, h.device) if t is not None else None
                for t in (x_ref, init_sample, inpainting_mask,
                          audio_embedding))

        # inpainting / img2img reference channels: the converted inpainting
        # unet expects out_channels reference + 1 mask extra in-channels
        extra_in = ucfg.in_channels - ucfg.out_channels
        if extra_in > 0 and ucfg.in_psd_freqs == 0 and x_ref is None:
            base_shape = sample_shape or (
                tuple(init_sample.shape) if init_sample is not None else None)
            assert base_shape is not None, \
                "sample_shape or init_sample required for inpainting ref"
            base = (init_sample.astype(jnp.float32) if init_sample is not None
                    else jnp.zeros(base_shape, jnp.float32))
            if inpainting_mask is not None:
                mask = (inpainting_mask > 0.5).astype(jnp.float32)
                mask = jnp.broadcast_to(mask, base.shape[:-1] + (1,))
            else:
                # no mask: generate everything (reference :444-447)
                mask = jnp.ones(base.shape[:-1] + (1,), jnp.float32)
                base = jnp.zeros_like(base)
            x_ref = jnp.concatenate([base * (1.0 - mask), mask], axis=-1)
            sample_shape = tuple(base_shape)

        if audio_embedding is not None and ucfg.in_channels_emb > 0:
            from ..models.unet import UNet as _U

            def _emb_apply(v, e, m):
                with self._fold_ctx():  # uvars may be a folded tree
                    return unet.apply(v, e, m, method=_U.get_embeddings)

            emb_fn = self._jitted(f"{module_name}_get_embeddings",
                                  _emb_apply)
            emb_c = emb_fn(uvars, audio_embedding,
                           jnp.ones((audio_embedding.shape[0],)))
            emb_u = emb_fn(uvars, audio_embedding,
                           jnp.zeros((audio_embedding.shape[0],)))
            emb2 = jnp.concatenate([emb_c, emb_u], axis=0)
        else:
            emb2 = None

        ref2 = None
        if x_ref is not None:
            ref2 = jnp.concatenate([x_ref, x_ref], axis=0)
            sample_shape = sample_shape or tuple(
                x_ref.shape[:1]) + tuple(x_ref.shape[1:])
        assert sample_shape is not None, "sample_shape required without x_ref"

        use_cfg = emb2 is not None
        ref_in = ref2 if use_cfg else x_ref

        def denoise(x, sigma, ref=None):
            with self._fold_ctx():
                return unet.apply(uvars, x, sigma, emb2, ref)

        # the ref is passed through the sampler (not closed over) so the
        # seamless-loop torus shift can roll it with the sample
        # (reference: dual_diffusion_pipeline.py:467-474)
        return edm_sample(denoise, sample_shape, params,
                          params.sigma_max or ucfg.sigma_max,
                          params.sigma_min or ucfg.sigma_min,
                          params.sigma_data or ucfg.sigma_data,
                          key, init_sample=init_sample, use_cfg=use_cfg,
                          x_ref=ref_in,
                          chunk_size=chunk_size, chunk_callback=chunk_callback)

    def encode_input_audio(self, input_audio, length: Optional[int] = None):
        """Prepare raw input audio for img2img / inpainting: crop/pad to the
        format's raw crop width, format-encode, and DAE-encode when a DAE is
        present (reference: dual_diffusion_pipeline.py:427-438).

        input_audio: (C, T) or (B, C, T). Returns the init sample in the
        diffusion space (latents if a DAE exists, else the format sample).
        """
        fmt = self.format
        audio = jnp.asarray(input_audio, jnp.float32)
        if audio.ndim == 2:
            audio = audio[None]
        want = fmt.get_raw_crop_width(length)
        t = audio.shape[-1]
        if t < want:
            audio = jnp.pad(audio, [(0, 0), (0, 0), (0, want - t)])
        else:
            audio = audio[..., :want]
        sample = self._jitted("raw_to_sample", fmt.raw_to_sample)(audio)
        dae_h = self.modules.get("dae")
        if dae_h is not None:
            from ..models.dae import DAE as _DAE
            ds = dae_h.module.downsample_ratio
            sample = sample[:, :, : sample.shape[2] // ds * ds]
            sample = self._jitted(
                "dae_encode",
                lambda v, s: dae_h.module.apply(v, s, method=_DAE.encode))(
                dae_h.variables, sample)
        return sample.astype(jnp.float32)

    def generate(self, params, key: jax.Array,
                 prompt_embedding: Optional[jnp.ndarray] = None,
                 decode_mode: str = "auto",
                 input_audio=None,
                 input_latents: Optional[jnp.ndarray] = None,
                 inpainting_mask: Optional[jnp.ndarray] = None,
                 chunk_size=None, chunk_callback=None):
        """Full generation: latent sampling -> DAE decode -> audio.

        decode_mode: "fgla" (mel unscale + FGLA), "ddec" (diffusion decoder
        on MDCT), or "auto" (ddec if present else fgla).

        img2img: pass ``input_audio`` (raw (C,T)/(B,C,T)) or pre-encoded
        ``input_latents``; ``params.img2img_strength`` controls how much of
        the schedule runs. ``inpainting_mask`` (1 = generate, 0 = keep) adds
        the reference+mask channels and substitutes ``unet_inpainting`` when
        available; inpainting always runs the full schedule.

        Returns dict(raw, sample/mel, latents, debug).
        """
        import dataclasses as _dc
        fmt = self.format
        assert fmt is not None, "pipeline has no format module"
        k1, k2, k3 = jax.random.split(key, 3)

        init = input_latents
        if init is None and input_audio is not None:
            init = self.encode_input_audio(input_audio, params.length)
        if init is not None and init.shape[0] < params.batch_size:
            init = jnp.broadcast_to(init, (params.batch_size,) + init.shape[1:])
        sample_params = params
        if inpainting_mask is not None:
            sample_params = _dc.replace(params, img2img_strength=1.0)

        dae_h = self.modules.get("dae")
        if dae_h is not None:
            from ..models.dae import DAE as _DAE
            mel_shape = fmt.get_sample_shape(params.batch_size, params.length)
            lat_shape = tuple(dae_h.module.apply(dae_h.variables, mel_shape,
                                                 method=_DAE.get_latent_shape))
            if init is not None:
                assert tuple(init.shape[1:]) == lat_shape[1:], (
                    f"init sample shape {tuple(init.shape)} does not match "
                    f"latent shape {lat_shape}")
            latents, debug = self.diffusion_decode(
                sample_params, k1, sample_shape=lat_shape,
                audio_embedding=prompt_embedding, init_sample=init,
                inpainting_mask=inpainting_mask,
                chunk_size=chunk_size, chunk_callback=chunk_callback)
            if dae_h.device is not None:
                # heterogeneous placement: move the stage input to the
                # DAE's committed device (jit rejects mixed placements)
                latents = jax.device_put(latents, dae_h.device)
            def _dae_decode(v, z):
                with self._fold_ctx():
                    return dae_h.module.apply(
                        v, z, method=_DAE.decode).astype(jnp.float32)

            mel = self._jitted("dae_decode", _dae_decode)(
                self._folded_variables("dae", dae_h), latents)
        else:
            mel_shape = fmt.get_sample_shape(params.batch_size, params.length)
            mel, debug = self.diffusion_decode(
                sample_params, k1, sample_shape=tuple(mel_shape),
                audio_embedding=prompt_embedding, init_sample=init,
                inpainting_mask=inpainting_mask,
                chunk_size=chunk_size, chunk_callback=chunk_callback)
            latents = None

        if decode_mode == "auto":
            decode_mode = "ddec" if "ddec" in self.modules else "fgla"

        if decode_mode == "ddec":
            from ..models.formats.ms_mdct_dual import MSMDCTDualFormat
            assert isinstance(fmt, MSMDCTDualFormat), \
                "ddec decode requires the ms_mdct_dual format"
            lin = self._jitted("mel_spec_to_linear",
                               fmt.mel_spec_to_linear)(mel)
            # the mel and MDCT frame grids share the same hop by construction
            # (format guarantee), so the conditioning width IS the MDCT width
            mdct_shape = fmt.get_mdct_shape_for_mel_frames(
                params.batch_size, lin.shape[2])
            coeffs, ddbg = self.diffusion_decode(
                params, k2, sample_shape=mdct_shape,
                x_ref=lin, module_name="ddec")
            raw = self._jitted("mdct_to_raw", fmt.mdct_to_raw)(coeffs)
            debug["ddec"] = ddbg
        else:
            ni = params.num_fgla_iters
            decode = (fmt.sample_to_raw_fgla
                      if hasattr(fmt, "sample_to_raw_fgla")
                      else fmt.sample_to_raw)
            # production FGLA default: spsi@100 (SampleParams) — measured
            # better spectral convergence than flat@200 at equal wall
            # clock on mel-inverted magnitudes (BASELINE.md r4; VERDICT
            # r4 #6). Formats without a phase_init kwarg keep their config.
            import inspect
            kw = {}
            pi = getattr(params, "fgla_phase_init", None)
            if pi and "phase_init" in inspect.signature(decode).parameters:
                kw["phase_init"] = pi
            raw = self._jitted(
                f"sample_to_raw_{ni}_{kw.get('phase_init', 'cfg')}",
                lambda m, k: decode(m, n_fgla_iters=ni, key=k, **kw))(mel, k3)

        if params.seamless_loop:
            from ..sampling.sampler import seamless_loop_crossfade
            hop = getattr(fmt.config, "hop_length",
                          getattr(fmt.config, "ms_hop_length", 256))
            raw = seamless_loop_crossfade(raw, hop)

        return {"raw": raw, "sample": mel, "latents": latents, "debug": debug}
