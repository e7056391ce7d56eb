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


# ---------------------------------------------------------------------------
# reference (torch) UNet checkpoint -> this framework's variables tree
# ---------------------------------------------------------------------------

def _torch_key_to_flax_path(key: str):
    """Map one reference UNet state-dict key to this repo's flax param path.

    Reference naming (src/modules/unets/unet_edm2_q4_ddec.py:224-305 and
    unet_edm2_d1.py:224-330): enc.conv_in / enc.block{l}_down /
    enc.block{l}_layer{i} / dec.block{l}_in0|in1 / dec.block{l}_up /
    dec.block{l}_layer{i}, each with conv_res0/conv_res1/conv_skip/
    emb_gain/emb_linear (+ attn_qk/attn_v/attn_proj and the qk/v emb gains),
    plus top-level emb_noise/emb_label/emb_label_unconditional/
    logvar_linear/conv_out/out_gain. Weight layouts are identical
    ((out, in//groups, *kernel)); only names translate.
    """
    import re

    parts = key.split(".")

    def leaf(mod_parts):
        # trailing parameter name -> flax leaf name
        tail = mod_parts[-1]
        if tail == "weight":
            return mod_parts[:-1], "w_mp"
        if tail == "bias":
            return mod_parts[:-1], "bias"
        return mod_parts, None  # scalar params (emb_gain, out_gain)

    if parts[0] in ("enc", "dec"):
        block = parts[1]
        m = re.fullmatch(r"conv_in", block)
        if m:
            mods, l = leaf(parts[2:])
            return ("core", "enc_conv_in") + tuple(mods) + ((l,) if l else ())
        m = re.fullmatch(r"block(\d+)_(down|up|in0|in1)", block)
        if m:
            lvl, kind = m.groups()
            name = f"{parts[0]}_b{lvl}_{kind}"
        else:
            m = re.fullmatch(r"block(\d+)_layer(\d+)", block)
            if not m:
                raise KeyError(f"unrecognized block key: {key}")
            lvl, idx = m.groups()
            name = f"{parts[0]}_b{lvl}_l{idx}"
        rest = parts[2:]
        if rest == ["emb_gain"]:
            return ("core", name, "emb_gain")
        if rest in (["emb_gain_qk"], ["emb_gain_v"]):
            return ("core", name, rest[0])
        if rest[0] in ("emb_linear_qk", "emb_linear_v"):
            mods, l = leaf(rest)
            return ("core", name) + tuple(mods) + ((l,) if l else ())
        mods, l = leaf(rest)
        return ("core", name) + tuple(mods) + ((l,) if l else ())
    if parts == ["out_gain"]:
        return ("core", "out_gain")
    if parts[0] == "conv_out":
        mods, l = leaf(parts)
        return ("core",) + tuple(mods) + ((l,) if l else ())
    if parts[0] == "emb_noise":
        mods, l = leaf(parts)
        return ("core",) + tuple(mods) + ((l,) if l else ())
    if parts[0] in ("emb_label", "emb_label_unconditional"):
        mods, l = leaf(parts)
        return tuple(mods) + ((l,) if l else ())
    if parts[0] == "logvar_linear":
        mods, l = leaf(parts)
        # disable_weight_norm -> raw weight name
        return tuple(mods) + (("w_raw",) if l == "w_mp" else (l,))
    raise KeyError(f"unrecognized reference UNet key: {key}")


def torch_unet_state_to_variables(state_dict, template_variables):
    """Convert a reference torch UNet state dict (numpy-valued) into this
    repo's flax variables tree, validated against ``template_variables``
    (an initialized tree of the matching UNetConfig).

    Buffers (MPFourier freqs/phases) carry no information — both
    implementations compute them from the same formula — and are skipped.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat_t = flatten_dict(template_variables["params"])
    out = dict(flat_t)
    used = set()
    for key, val in state_dict.items():
        if key.endswith(("freqs", "phases")):  # MPFourier buffers
            continue
        path = _torch_key_to_flax_path(key)
        if path not in flat_t:
            raise KeyError(f"{key} -> {path} not in template tree; "
                           f"have e.g. {list(flat_t)[:5]}")
        tval = flat_t[path]
        val = np.asarray(val, np.float32).reshape(np.shape(tval))
        out[path] = jnp.asarray(val)
        used.add(path)
    missing = set(flat_t) - used
    if missing:
        raise KeyError(f"template params not covered by state dict: "
                       f"{sorted(missing)[:8]}")
    return dict(template_variables, params=unflatten_dict(out))


def torch_dae_state_to_variables(state_dict, template_variables,
                                 num_levels: int,
                                 num_enc_layers: int, num_dec_layers: int):
    """Convert a reference torch DAE (q4) state dict into this repo's flax
    variables tree (reference: src/modules/daes/dae_edm2_q4.py:205-300).

    The reference's enc/dec ModuleDicts are ordered exactly like this
    repo's ``enc``/``dec`` setup lists, so names map positionally:
    enc order = [block{l}_down (l>0)] + layers per level; dec order =
    [block{L-1}_in0 | block{l}_up] + layers, levels reversed. conv_in /
    conv_latents_out / conv_latents_in / conv_out / out_gain /
    recon_loss_logvar map by name; latent-stats buffers map into the
    'stats' collection.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    enc_names = []
    for level in range(num_levels):
        if level > 0:
            enc_names.append(f"block{level}_down")
        enc_names += [f"block{level}_layer{i}" for i in range(num_enc_layers)]
    dec_names = []
    for level in reversed(range(num_levels)):
        dec_names.append(f"block{level}_in0" if level == num_levels - 1
                         else f"block{level}_up")
        dec_names += [f"block{level}_layer{i}" for i in range(num_dec_layers)]
    enc_idx = {n: i for i, n in enumerate(enc_names)}
    dec_idx = {n: i for i, n in enumerate(dec_names)}

    def path_of(key: str):
        parts = key.split(".")
        leaf = {"weight": "w_mp", "bias": "bias"}.get(parts[-1])
        if parts[0] == "enc":
            if parts[1] == "conv_in":
                return ("conv_in", leaf)
            return (f"enc_{enc_idx[parts[1]]}",) + tuple(parts[2:-1]) \
                + ((leaf,) if leaf else (parts[-1],))
        if parts[0] == "dec":
            return (f"dec_{dec_idx[parts[1]]}",) + tuple(parts[2:-1]) \
                + ((leaf,) if leaf else (parts[-1],))
        if parts[0] in ("conv_latents_out", "conv_latents_in", "conv_out"):
            return (parts[0], leaf)
        if parts == ["out_gain"] or parts == ["recon_loss_logvar"]:
            return (parts[0],)
        raise KeyError(f"unrecognized reference DAE key: {key}")

    flat_t = flatten_dict(template_variables["params"])
    out = dict(flat_t)
    used = set()
    for key, val in state_dict.items():
        if key.startswith("latents_stats_tracker"):
            continue  # running stats; seeded fresh (stats collection)
        path = path_of(key)
        if path not in flat_t:
            raise KeyError(f"{key} -> {path} not in template tree; "
                           f"have e.g. {sorted(flat_t)[:6]}")
        val = np.asarray(val, np.float32).reshape(np.shape(flat_t[path]))
        out[path] = jnp.asarray(val)
        used.add(path)
    missing = set(flat_t) - used
    if missing:
        raise KeyError(f"template params not covered: {sorted(missing)[:8]}")
    return dict(template_variables, params=unflatten_dict(out))
