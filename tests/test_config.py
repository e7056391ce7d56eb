import dataclasses
import logging
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from dualdiffusion_tpu.utils import config as cfg


@dataclass
class Inner:
    a: int = 1
    b: List[float] = field(default_factory=lambda: [1.0, 2.0])


@dataclass
class Outer:
    name: str
    inner: Inner = field(default_factory=Inner)
    table: Dict[str, Inner] = field(default_factory=dict)
    opt: Optional[int] = None


def test_roundtrip(tmp_path):
    obj = Outer(name="x", inner=Inner(a=5, b=[3.0]), table={"k": Inner(a=7)}, opt=9)
    p = tmp_path / "c.json"
    cfg.save_config(obj, p)
    loaded = cfg.load_config(Outer, p)
    assert loaded == obj


def test_json5_comments(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{\n  // comment\n  "name": "y", /* block */ "opt": 3,\n}\n')
    loaded = cfg.load_config(Outer, p)
    assert loaded.name == "y" and loaded.opt == 3


def test_unknown_field_warns(tmp_path, caplog):
    p = tmp_path / "c.json"
    p.write_text('{"name": "z", "bogus": 1}')
    with caplog.at_level(logging.WARNING):
        loaded = cfg.load_config(Outer, p)
    assert loaded.name == "z"
    assert any("unknown field" in r.message for r in caplog.records)


def test_nested_hydration(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"name": "n", "inner": {"a": 2, "b": [4.0, 5.0]}, "table": {"q": {"a": 3}}}')
    loaded = cfg.load_config(Outer, p)
    assert loaded.inner.a == 2 and loaded.table["q"].a == 3
    assert isinstance(loaded.inner, Inner) and isinstance(loaded.table["q"], Inner)


def test_atomic_save(tmp_path):
    p = tmp_path / "sub" / "c.json"
    cfg.save_json({"v": 1}, p)
    assert cfg.load_json(p) == {"v": 1}
    assert not list(p.parent.glob("*.tmp"))


def test_model_preset_configs_hydrate():
    """Every preset under configs/models hydrates cleanly: each module
    json maps onto its registered config dataclass with no unknown-field
    warnings, and the module object constructs."""
    import warnings
    from pathlib import Path
    from dualdiffusion_tpu.pipelines.pipeline import get_module_class
    from dualdiffusion_tpu.utils.config import load_config, load_json

    root = Path(__file__).parents[1] / "configs" / "models"
    presets = sorted(p for p in root.iterdir() if p.is_dir())
    assert len(presets) >= 4, presets
    for preset in presets:
        index = load_json(preset / "model_index.json")
        for name, mtype in index["modules"].items():
            factory, cfg_cls = get_module_class(mtype)
            fname = "format.json" if mtype.startswith("format:") \
                else f"{name}.json"
            with warnings.catch_warnings():
                warnings.simplefilter("error")  # unknown fields fail
                cfg = load_config(cfg_cls, preset / fname)
            module = factory(cfg)
            assert module is not None, (preset.name, name)
