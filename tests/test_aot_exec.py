"""Compiled-executable blob roundtrip (utils/aot.py save_exec/load_exec).

The warm-restart path pickles each bench stage's compiled PjRt executable
(jax.experimental.serialize_executable) so a fresh process skips tracing
and compilation (VERDICT r4 #3). These tests exercise the save/load
protocol and its fallback behavior on the CPU backend.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dualdiffusion_tpu.utils import aot


def test_exec_blob_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("DD_JAX_CACHE_DIR", str(tmp_path))

    def f(x, y):
        return {"z": x @ y["w"] + 1.0}

    x = jnp.ones((64, 64))
    y = {"w": jnp.full((64, 64), 0.5)}
    compiled = jax.jit(f).lower(x, y).compile()
    key = aot.exec_key("stage", "cfg-repr", 64)
    assert aot.load_exec("t", key) is None  # absent -> None
    aot.save_exec("t", key, compiled)
    call = aot.load_exec("t", key)
    assert call is not None
    out = call(x, y)
    np.testing.assert_allclose(np.asarray(out["z"]),
                               np.asarray(f(x, y)["z"]), rtol=1e-6)


def test_exec_blob_corrupt_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("DD_JAX_CACHE_DIR", str(tmp_path))
    key = aot.exec_key("stage2")
    path = aot._exec_path("t2", key)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b"not a pickle")
    assert aot.load_exec("t2", key) is None  # unusable -> None + unlink
    assert not path.is_file()


def test_exec_key_varies_with_parts():
    assert aot.exec_key("a") != aot.exec_key("b")
    assert aot.exec_key("a", 1) != aot.exec_key("a", 2)


def test_exec_blob_disabled_cache_dir(monkeypatch):
    monkeypatch.setenv("DD_JAX_CACHE_DIR", "off")
    assert aot.load_exec("t3", "deadbeef") is None
    # save is a no-op (no crash)
    aot.save_exec("t3", "deadbeef", None)
