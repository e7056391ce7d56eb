"""Model server: dedicated inference process with a shared-dict command
protocol.

Capability parity with the reference's ModelServer
(reference: src/sampling/model_server.py:43-146): a separate process polls
a ``multiprocessing.Manager().dict()`` at 10 Hz for commands —
``load_model``, ``compile_model`` (warm-up passes), ``generate`` (with
chunked step previews + abort via the shared dict),
``get_module_state_dict``, ``get_latent_shape``, ``get_prompt_labels`` —
and writes results/errors back into the dict. The UI (or any client)
communicates purely through the dict, so the accelerator stays isolated in
its own process.
"""

from __future__ import annotations

import logging
import multiprocessing
import os
import time
import traceback
from datetime import datetime
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger("model_server")


class ModelServer:
    def __init__(self, state) -> None:
        self.state = state
        self.pipeline = None
        self._init_logging()

    def _init_logging(self) -> None:
        from ..utils import DEBUG_PATH
        logger.setLevel(logging.DEBUG)
        if DEBUG_PATH:
            d = os.path.join(DEBUG_PATH, "model_server")
            os.makedirs(d, exist_ok=True)
            stamp = datetime.now().strftime("%Y-%m-%d_%H_%M_%S")
            self.log_path = os.path.join(d, f"model_server_{stamp}.log")
            logging.basicConfig(handlers=[logging.FileHandler(self.log_path),
                                          logging.StreamHandler()],
                                format="ModelServer: %(message)s")
        else:
            self.log_path = None

    # ---- commands -------------------------------------------------------
    def cmd_get_available_devices(self) -> None:
        import jax
        self.state["available_devices"] = [str(d) for d in jax.devices()]

    def cmd_load_model(self) -> None:
        from ..pipelines import Pipeline
        from ..utils import MODELS_PATH
        name = self.state["model_name"]
        path = name if os.path.isdir(name) else os.path.join(MODELS_PATH or "", name)
        logger.info("loading pipeline from %s", path)
        self.pipeline = Pipeline.from_pretrained(
            path, **self.state.get("model_load_options", {}))
        self.model_path = path
        fmt = self.pipeline.format
        self.state["format_config"] = dict(fmt.config.__dict__) if fmt else {}
        labels = sorted({k.rsplit("_", 1)[0]
                         for k in self.pipeline.dataset_embeddings
                         if not k.startswith("_")})
        self.state["prompt_labels"] = labels
        self.state["model_modules"] = list(self.pipeline.modules)

    def cmd_compile_model(self) -> None:
        """Warm-up pass so the first real generate is fast
        (reference :101-113)."""
        import jax
        from ..sampling import SampleParams
        params = self._params(dict(self.state.get("sample_params", {}),
                                   steps=1, use_heun=False, num_fgla_iters=1))
        emb = self.pipeline.get_prompt_embedding(params.prompt)
        self.pipeline.generate(params, jax.random.PRNGKey(0),
                               prompt_embedding=emb)
        logger.info("compilation warm-up complete")

    def _params(self, overrides: Dict[str, Any]):
        from ..sampling import SampleParams
        import dataclasses
        fields = {f.name for f in dataclasses.fields(SampleParams)}
        return SampleParams(**{k: v for k, v in overrides.items() if k in fields})

    def cmd_generate(self) -> None:
        """One full generation via Pipeline.generate — the DDEC diffusion
        decode, img2img/inpainting, and seamless-loop crossfade all come
        from the single orchestration path (no drift with the CLI), with
        chunked step previews + abort over the shared dict
        (reference: model_server.py:111-113 + pipeline :540-546)."""
        import jax
        params = self._params(self.state.get("sample_params", {}))
        seed = params.seed or int(np.random.randint(100000, 999999))
        emb = self.pipeline.get_prompt_embedding(params.prompt)
        self.state["generate_step"] = 0
        self.state["generate_abort"] = False

        def chunk_cb(done, sample):
            self.state["generate_step"] = int(done)
            self.state["generate_latents"] = np.asarray(sample)
            return bool(self.state.get("generate_abort", False))

        fmt = self.pipeline.format
        out = self.pipeline.generate(
            params, jax.random.PRNGKey(seed), prompt_embedding=emb,
            decode_mode=self.state.get("decode_mode", "auto"),
            input_audio=self.state.get("input_audio"),
            input_latents=self.state.get("input_latents"),
            inpainting_mask=self.state.get("inpainting_mask"),
            chunk_size=max(params.steps // 10, 1), chunk_callback=chunk_cb)
        if self.state.get("generate_abort", False):
            self.state["generate_output"] = None
        else:
            self.state["generate_output"] = {
                "raw": np.asarray(out["raw"]),
                "sample": np.asarray(out["sample"]),
                "latents": (None if out["latents"] is None
                            else np.asarray(out["latents"])),
                "seed": seed, "sample_rate": fmt.config.sample_rate,
            }
        self.state["generate_step"] = None
        self.state["generate_latents"] = None

    def cmd_get_inventory(self) -> None:
        """Checkpoint + EMA inventory per module (the reference UI's Model
        Explorer data; reference: dual_diffusion_pipeline.py:190-215 +
        nicegui_app.py:84-221)."""
        import jax
        from ..pipelines import Pipeline
        inv = {}
        loaded = self.state.get("model_load_options", {})
        ck_sel = loaded.get("load_checkpoints", False)
        ema_sel = loaded.get("load_emas", {}) or {}
        for name, h in self.pipeline.modules.items():
            sel = (ck_sel.get(name) if isinstance(ck_sel, dict)
                   else ("latest" if ck_sel else None))
            inv[name] = {
                "type": h.module_type,
                "params": int(sum(np.size(x) for x in
                                  jax.tree_util.tree_leaves(h.variables))),
                "checkpoints": [p.name for p in
                                Pipeline.get_checkpoints(self.model_path, name)],
                "emas": Pipeline.get_available_emas(self.model_path, name),
                "loaded_checkpoint": sel or "root",
                "loaded_ema": ema_sel.get(name) or "none",
            }
        self.state["inventory"] = inv

    def cmd_get_module_state_dict(self) -> None:
        from ..pipelines.pipeline import _flatten
        name = self.state.get("module_name", "unet")
        h = self.pipeline.modules[name]
        self.state["module_state_dict"] = {
            k: np.asarray(v) for k, v in _flatten(h.variables).items()}

    def cmd_get_latent_shape(self) -> None:
        from ..models.dae import DAE as _DAE
        fmt = self.pipeline.format
        mel_shape = fmt.get_sample_shape(1, self.state.get("audio_length"))
        dae_h = self.pipeline.modules.get("dae")
        if dae_h is not None:
            shape = dae_h.module.apply(dae_h.variables, mel_shape,
                                       method=_DAE.get_latent_shape)
        else:
            shape = mel_shape
        self.state["latent_shape"] = tuple(int(s) for s in shape)

    # ---- loop -----------------------------------------------------------
    def run(self) -> None:
        from ..utils.jax_cache import enable_compilation_cache
        enable_compilation_cache()
        logger.info("model server started")
        while True:
            cmd = self.state.get("cmd")
            if cmd is None:
                time.sleep(0.1)
                continue
            if cmd == "shutdown":
                self.state["cmd"] = None
                logger.info("model server shutting down")
                return
            try:
                logger.debug("processing command '%s'", cmd)
                getattr(self, f"cmd_{cmd}")()
                self.state["error"] = None
            except Exception as e:
                err = f"error processing command '{cmd}': {e}"
                logger.error("%s\n%s", err, traceback.format_exc())
                self.state["error"] = err
            finally:
                self.state["cmd"] = None


def start_model_server(state) -> None:
    """Entry point for multiprocessing.Process."""
    platform = os.environ.get("DD_MODEL_SERVER_PLATFORM")
    if platform:
        # force a backend (tests run the server on CPU); config-level
        # override — env vars are preempted by the environment's
        # interpreter-start jax import
        import jax
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
    # single-chip inference process: the Pallas grouped-conv lowering is
    # a measured ~17% sampler win at ref scale (BASELINE r4); users
    # sharding across chips run sample.py --tp, not this server. TPU
    # only: on other backends the kernel falls back to interpret mode,
    # which is pathologically slow at real sizes (ADVICE r4 low).
    import jax
    if jax.default_backend() == "tpu":
        os.environ.setdefault("DD_GROUPED_PALLAS_CONV", "1")
    ModelServer(state).run()


def launch(model_name: Optional[str] = None):
    """Spawn the server process; returns (process, shared state dict)."""
    manager = multiprocessing.Manager()
    state = manager.dict()
    proc = multiprocessing.get_context("spawn").Process(
        target=start_model_server, args=(state,), daemon=True)
    proc.start()
    if model_name is not None:
        state["model_name"] = model_name
        state["cmd"] = "load_model"
    return proc, state
