"""jax.export stage-blob roundtrip (utils/aot.py save_stage/load_stage).

This is the warm-start default path (DD_AOT=1): a full bench run exports
each flagship stage's traced module and SEEDS the persistent compile
cache by compiling the deserialized module once; a serving restart then
pays imports + deserialize + cached compile + prime instead of
re-tracing (the reference re-traces every process,
/root/reference/src/training/trainer.py:736-742).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualdiffusion_tpu.utils import aot


@pytest.fixture()
def aot_tmp(tmp_path, monkeypatch):
    monkeypatch.setenv("DD_JAX_CACHE_DIR", str(tmp_path))
    return tmp_path


def test_save_load_stage_roundtrip(aot_tmp):
    def fn(x, y):
        return jnp.tanh(x @ y) * 2.0

    x = jnp.arange(12.0).reshape(3, 4)
    y = jnp.ones((4, 5))
    key = aot.stage_key("cfg", (3, 4), "f32")
    assert aot.load_stage("t", key) is None  # absent -> None

    call = aot.save_stage("t", key, jax.jit(fn), x, y)
    want = np.asarray(jax.jit(fn)(x, y))
    np.testing.assert_allclose(np.asarray(call(x, y)), want, rtol=1e-6)

    # a fresh load (what a restart does) must deserialize and agree
    loaded = aot.load_stage("t", key)
    assert loaded is not None
    np.testing.assert_allclose(np.asarray(loaded(x, y)), want, rtol=1e-6)
    # the seed step of bench._export_aot: the deserialized module must
    # lower+compile at the stage avals (this writes the persistent-cache
    # entry the restart's compile then hits)
    loaded.lower(x, y).compile()


def test_load_stage_corrupt_blob_falls_back(aot_tmp):
    key = aot.stage_key("c")
    path = aot._path("t2", key)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b"not a serialized module")
    assert aot.load_stage("t2", key) is None  # unusable -> None + unlink
    assert not path.exists()


def test_stage_key_sensitivity():
    assert aot.stage_key("a") != aot.stage_key("b")
    assert aot.stage_key("a", 1) != aot.stage_key("a", 2)


def test_get_or_build_builds_once(aot_tmp):
    calls = []

    def build():
        calls.append(1)
        return jax.jit(lambda x: x + 1.0)

    x = jnp.zeros((4,))
    key = aot.stage_key("gb")
    c1 = aot.get_or_build("t3", key, build, x)
    assert len(calls) == 1
    c2 = aot.get_or_build("t3", key, build, x)
    assert len(calls) == 1  # second call loads the blob, no rebuild
    np.testing.assert_allclose(np.asarray(c2(x)), np.asarray(c1(x)))
