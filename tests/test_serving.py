"""End-to-end serving tests: real model-server process + web UI handlers
driven over HTTP (reference surface: src/sampling/model_server.py:43-146 +
the NiceGUI app's generate/abort/editor flows)."""

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini
import jax

from test_pipeline import make_pipeline  # tiny unet+dae+format pipeline


def _http(url, body=None, timeout=30):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode() if body is not None else None,
        method="POST" if body is not None else "GET")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        data = r.read()
        ctype = r.headers.get("Content-Type", "")
    return (json.loads(data) if ctype.startswith("application/json")
            else data)


@pytest.fixture(scope="module")
def serving(tmp_path_factory):
    model_dir = tmp_path_factory.mktemp("model")
    make_pipeline(jax.random.PRNGKey(0)).save_pretrained(model_dir)

    import os
    os.environ["DD_MODEL_SERVER_PLATFORM"] = "cpu"
    from dualdiffusion_tpu.serving.model_server import launch
    from dualdiffusion_tpu.serving.webui import UIState, _make_handler

    proc, state = launch(str(model_dir))
    t0 = time.time()
    while state.get("cmd") is not None and time.time() - t0 < 120:
        time.sleep(0.2)
    assert state.get("error") is None, state.get("error")

    ui = UIState(state, Path(model_dir) / "presets")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(ui))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}", state, ui
    state["cmd"] = "shutdown"
    httpd.shutdown()
    proc.join(timeout=20)
    if proc.is_alive():
        proc.terminate()


def _generate(base, body, timeout=180):
    r = _http(f"{base}/api/generate", body)
    assert r.get("ok"), r
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = _http(f"{base}/api/status")
        if not st["busy"]:
            break
        time.sleep(0.5)
    else:
        raise TimeoutError("generate did not finish")
    return _http(f"{base}/api/outputs")


def test_serving_generate_and_outputs(serving):
    base, state, ui = serving
    page = _http(f"{base}/")
    assert b"dualdiffusion-tpu" in page

    info = _http(f"{base}/api/info")
    assert "unet" in info["modules"]

    outs = _generate(base, {"steps": 2, "use_heun": False, "cfg_scale": 1.0,
                            "length": 4096, "num_fgla_iters": 2})
    assert len(outs) == 1
    wav = _http(f"{base}/api/output/0/audio.wav")
    assert wav[:4] == b"RIFF"
    png = _http(f"{base}/api/output/0/spec.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_serving_inventory_nonblocking(serving):
    base, state, ui = serving
    t0 = time.time()
    r = _http(f"{base}/api/inventory")
    assert time.time() - t0 < 2.0  # never blocks the handler thread
    for _ in range(50):
        if not (isinstance(r, dict) and r.get("pending")):
            break
        time.sleep(0.2)
        r = _http(f"{base}/api/inventory")
    assert "unet" in r


def test_serving_output_editor_inpaint_and_extend(serving):
    base, state, ui = serving
    if not ui.outputs:
        _generate(base, {"steps": 2, "use_heun": False, "cfg_scale": 1.0,
                         "length": 4096, "num_fgla_iters": 2})
    n0 = len(ui.outputs)

    # inpaint a sub-range of output 0 (builds input_latents + mask)
    outs = _generate(base, {"steps": 2, "use_heun": False, "cfg_scale": 1.0,
                            "length": 4096, "num_fgla_iters": 2,
                            "input_output_id": 0,
                            "inpaint_start": 0.0, "inpaint_end": 0.05})
    assert len(outs) == n0 + 1
    # editor state is cleared after the run
    assert state.get("input_latents") is None

    # extend (outpaint append)
    outs = _generate(base, {"steps": 2, "use_heun": False, "cfg_scale": 1.0,
                            "length": 4096, "num_fgla_iters": 2,
                            "input_output_id": 0, "extend": "append"})
    assert len(outs) == n0 + 2
    for o in ui.outputs:
        assert np.isfinite(np.asarray(o["raw"])).all()


def test_serving_module_state_dict_and_latent_shape(serving):
    base, state, ui = serving
    state["module_name"] = "unet"
    state["cmd"] = "get_module_state_dict"
    t0 = time.time()
    while state.get("cmd") is not None and time.time() - t0 < 60:
        time.sleep(0.2)
    sd = state.get("module_state_dict")
    assert sd and all(isinstance(v, np.ndarray) for v in sd.values())

    state["audio_length"] = 4096
    state["cmd"] = "get_latent_shape"
    t0 = time.time()
    while state.get("cmd") is not None and time.time() - t0 < 60:
        time.sleep(0.2)
    shape = state.get("latent_shape")
    assert isinstance(shape, tuple) and len(shape) == 4


def test_editor_outpaint_odd_width(tmp_path):
    """_setup_editor_input extend math must keep latents width == mask
    width for ODD latent widths too (kept + freed halves complementary)."""
    from dualdiffusion_tpu.serving.webui import UIState, _setup_editor_input

    for w in (7, 8):
        for direction in ("append", "prepend"):
            ui = UIState({}, tmp_path)
            lat = 1.0 + np.arange(1 * 4 * w * 2,
                                  dtype=np.float32).reshape(1, 4, w, 2)
            ui.outputs = [{"latents": lat,
                           "raw": np.zeros((1, 2, 32000), np.float32),
                           "sample_rate": 32000}]
            params = {"input_output_id": 0, "extend": direction}
            _setup_editor_input(ui, params)
            out_lat = ui.server_state["input_latents"]
            mask = ui.server_state["inpainting_mask"]
            assert out_lat.shape == lat.shape, (w, direction, out_lat.shape)
            assert mask.shape == (1, 1, w, 1)
            # freed region is zeroed latents AND mask==1; kept region is
            # real data AND mask==0
            freed = mask[0, 0, :, 0] == 1.0
            assert freed.sum() == w // 2
            assert np.all(out_lat[:, :, freed] == 0.0)
            assert np.all(out_lat[:, :, ~freed] != 0.0) or w == 0


def test_serving_rate_and_save_output(serving):
    """Rating + save-to-disk workflow: the saved wav gets the rating in
    its (sidecar) tags and re-rating updates them (reference:
    nicegui_app save flow + update_audio_metadata)."""
    base, state, ui = serving
    if not ui.outputs:
        _generate(base, {"steps": 2, "use_heun": False, "cfg_scale": 1.0,
                         "length": 4096, "num_fgla_iters": 2})
    r = _http(f"{base}/api/output/0/rate", {"rating": 4})
    assert r["ok"] and r["rating"] == 4
    outs = _http(f"{base}/api/outputs")
    assert outs[0]["rating"] == 4

    r = _http(f"{base}/api/output/0/save", {})
    assert r.get("ok"), r
    from dualdiffusion_tpu.utils import get_audio_metadata
    tags = get_audio_metadata(r["path"])
    assert tags["RATING"] == ["4"]
    assert Path(r["path"]).is_file()

    # re-rating an already-saved output re-tags the file on disk
    _http(f"{base}/api/output/0/rate", {"rating": 1})
    assert get_audio_metadata(r["path"])["RATING"] == ["1"]

    r404 = urllib.request.Request(f"{base}/api/output/99/rate",
                                  data=b"{}", method="POST")
    try:
        urllib.request.urlopen(r404, timeout=10)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_serving_model_explorer_checkpoint_ema_load(serving):
    """Model explorer flow: the inventory reports per-module checkpoints,
    EMAs, param counts, and the loaded selection; /api/load_model with a
    per-module dict reloads one module from a specific checkpoint with an
    EMA (reference: nicegui_app.py:84-221 model explorer +
    dual_diffusion_pipeline.py:190-215)."""
    base, state, ui = serving
    # manufacture a checkpoint + EMA for the unet in the live model dir
    from dualdiffusion_tpu.pipelines.pipeline import (Pipeline, _flatten,
                                                      save_module)
    from dualdiffusion_tpu.utils import save_safetensors
    model_dir = Path(state["model_name"])
    pipe = Pipeline.from_pretrained(model_dir)
    h = pipe.modules["unet"]
    scaled = jax.tree_util.tree_map(lambda v: v * 2.0, h.variables)
    ckpt = model_dir / "unet_checkpoint-10"
    save_module(ckpt, "unet", h.module_type, h.config, scaled, 10)
    flat = _flatten(h.variables)
    save_safetensors({k: v * 0.25 for k, v in flat.items()},
                     ckpt / "unet" / "ema_explorer.safetensors")

    state["inventory"] = None
    r = _http(f"{base}/api/load_model",
              {"load_checkpoints": {"unet": "unet_checkpoint-10"},
               "load_emas": {"unet": "explorer"}})
    assert r.get("ok"), r
    t0 = time.time()
    while time.time() - t0 < 120:
        st = _http(f"{base}/api/status")
        if not st["busy"]:
            break
        time.sleep(0.3)
    assert state.get("error") is None, state.get("error")

    # inventory reflects the new checkpoint and the loaded selection
    for _ in range(100):
        inv = _http(f"{base}/api/inventory")
        if not (isinstance(inv, dict) and inv.get("pending")):
            break
        time.sleep(0.2)
    assert "unet_checkpoint-10" in inv["unet"]["checkpoints"]
    assert inv["unet"]["loaded_checkpoint"] == "unet_checkpoint-10"
    assert inv["unet"]["loaded_ema"] == "explorer"
    assert inv["unet"]["params"] > 0 and inv["unet"]["type"]

    # the served module weights are the checkpoint dir's EMA file (which
    # REPLACES the module weights: x0.25 of the root weights)
    state["module_name"] = "unet"
    state["cmd"] = "get_module_state_dict"
    t0 = time.time()
    while state.get("cmd") is not None and time.time() - t0 < 60:
        time.sleep(0.2)
    sd = state["module_state_dict"]
    k0 = sorted(flat)[0]
    np.testing.assert_allclose(sd[k0], np.asarray(flat[k0]) * 0.25,
                               rtol=1e-6)

    # restore the plain model for any later test in this module
    state["model_load_options"] = {}
    state["cmd"] = "load_model"
    t0 = time.time()
    while state.get("cmd") is not None and time.time() - t0 < 120:
        time.sleep(0.3)
