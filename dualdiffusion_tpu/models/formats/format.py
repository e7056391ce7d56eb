"""Format base class + registry.

A Format converts raw audio (B, C, T) float32 to/from the 2D "sample"
representation the diffusion models operate on. Formats are stateless,
parameter-free, fp32-only (reference: src/modules/formats/format.py:29-42).

Canonical sample layout in this framework is channel-last (B, F, T, C)
(NHWC — native TPU conv layout); raw audio stays (B, C, T).

Formats are registered by name in an explicit registry (no importlib of
arbitrary class paths — SURVEY.md §7.1 safety note).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple, Type

_FORMAT_REGISTRY: Dict[str, Tuple[type, type]] = {}


def register_format(name: str):
    def deco(cls):
        _FORMAT_REGISTRY[name] = (cls, cls.config_class)
        cls.format_name = name
        return cls
    return deco


def get_format_class(name: str):
    if name not in _FORMAT_REGISTRY:
        raise KeyError(f"unknown format '{name}'; known: {sorted(_FORMAT_REGISTRY)}")
    return _FORMAT_REGISTRY[name]


@dataclass
class FormatConfig:
    sample_rate: int = 32000
    num_raw_channels: int = 2
    default_raw_length: int = 1408768


class Format:
    """Abstract format. Subclasses implement raw<->sample transforms."""

    config_class: Type[FormatConfig] = FormatConfig
    format_name: str = "abstract"
    has_trainable_parameters: bool = False

    def __init__(self, config: FormatConfig) -> None:
        self.config = config

    # ---- shape math ------------------------------------------------------
    def get_raw_crop_width(self, raw_length: Optional[int] = None) -> int:
        raise NotImplementedError

    def get_sample_shape(self, bsz: int = 1, raw_length: Optional[int] = None) -> Tuple[int, ...]:
        raise NotImplementedError

    # ---- transforms ------------------------------------------------------
    def raw_to_sample(self, raw):
        raise NotImplementedError

    def sample_to_raw(self, sample, **kwargs):
        raise NotImplementedError
