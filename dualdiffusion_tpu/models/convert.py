"""Model surgery utilities: inpainting conversion and weight combining.

Capability parity with the reference's module utils
(reference: src/modules/utils/convert_unet_to_inpainting.py:22-53 —
zero-init extra reference+mask in-channels per README Sep/2024 — and
combine_models.py — weight blending between model directories).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def convert_unet_to_inpainting(model_path: Union[str, Path],
                               module_name: str = "unet",
                               output_name: str = "unet_inpainting") -> Path:
    """Extend the UNet's input conv with zero-initialized channels for the
    inpainting reference (out_channels) + mask (1) and save as a new module.

    With zero-init extension the converted model is exactly equivalent to
    the original when the reference channels are zero, so it can be
    fine-tuned from the original weights (reference behavior).
    """
    from ..pipelines.pipeline import load_module, save_module
    module_type, config, variables = load_module(model_path, module_name)
    extra = config.out_channels + 1  # reference channels + mask

    new_config = dataclasses.replace(config, in_channels=config.in_channels + extra)

    def extend_conv_in(params):
        enc_key = None
        core = params["params"]["core"]
        for k in core:
            if k == "enc_conv_in":
                enc_key = k
        assert enc_key is not None, "could not find enc_conv_in"
        leaf_name = [n for n in core[enc_key] if n.startswith("w")][0]
        w = np.asarray(core[enc_key][leaf_name])  # (out, in, *k)
        pad = np.zeros((w.shape[0], extra) + w.shape[2:], w.dtype)
        core[enc_key][leaf_name] = jnp.asarray(np.concatenate([w, pad], axis=1))
        return params

    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    variables = extend_conv_in(variables)
    save_module(model_path, output_name, module_type, new_config, variables)

    # register in model_index.json
    from ..utils import load_json, save_json
    index_path = Path(model_path) / "model_index.json"
    index = load_json(index_path)
    index["modules"][output_name] = module_type
    save_json(index, index_path)
    out = Path(model_path) / output_name
    logger.info("wrote inpainting module to %s", out)
    return out


def combine_models(model_path_a: Union[str, Path], model_path_b: Union[str, Path],
                   module_name: str, t: float, output_path: Union[str, Path]) -> None:
    """Blend module weights: (1-t)*A + t*B (reference: combine_models.py)."""
    from ..pipelines.pipeline import load_module, save_module
    type_a, config, va = load_module(model_path_a, module_name)
    type_b, _, vb = load_module(model_path_b, module_name)
    assert type_a == type_b, f"module type mismatch: {type_a} vs {type_b}"
    blended = jax.tree_util.tree_map(
        lambda a, b: a * (1.0 - t) + b * t, va, vb)
    save_module(output_path, module_name, type_a, config, blended)
    logger.info("wrote blended module (t=%.3f) to %s", t, output_path)
