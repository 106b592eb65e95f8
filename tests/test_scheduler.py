"""DDPM scheduler parity vs analytic formulas (fp64 numpy ground truth)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sid_lsg_tpu.diffusion import DDPMScheduler, SchedulerConfig, compute_snr


@pytest.fixture(scope="module")
def sched():
    return DDPMScheduler(SchedulerConfig.sd())


def _np_tables():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    return betas, ac


def test_beta_schedule_matches_sd(sched):
    betas, ac = _np_tables()
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ac, rtol=1e-5)


def test_add_noise_closed_form(sched):
    _, ac = _np_tables()
    rng = np.random.RandomState(0)
    x0 = rng.randn(4, 8, 8, 4).astype(np.float32)
    eps = rng.randn(4, 8, 8, 4).astype(np.float32)
    t = np.array([0, 100, 625, 999])
    out = sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))
    want = (
        np.sqrt(ac[t])[:, None, None, None] * x0
        + np.sqrt(1 - ac[t])[:, None, None, None] * eps
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-6)


def test_pred_original_roundtrip_epsilon(sched):
    """add_noise then pred_original with the true eps must recover x0."""
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(8, 4, 4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(8, 4, 4, 4).astype(np.float32))
    t = jnp.asarray(rng.randint(0, 1000, size=(8,)))
    zt = sched.add_noise(x0, eps, t)
    x0_hat = sched.pred_original_sample(eps, t, zt)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_pred_original_roundtrip_v_prediction():
    sched = DDPMScheduler(SchedulerConfig.sd(prediction_type="v_prediction"))
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(8, 4, 4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(8, 4, 4, 4).astype(np.float32))
    t = jnp.asarray(rng.randint(0, 1000, size=(8,)))
    zt = sched.add_noise(x0, eps, t)
    v = sched.get_velocity(x0, eps, t)
    x0_hat = sched.pred_original_sample(v, t, zt)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_snr(sched):
    _, ac = _np_tables()
    t = jnp.asarray([10, 500, 990])
    got = compute_snr(sched, t)
    want = ac[[10, 500, 990]] / (1 - ac[[10, 500, 990]])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_vectorised_matches_per_sample_loop(sched):
    """The reference loops scheduler.step per sample (sid_sd_util.py:270);
    our vectorised pred_original must equal the loop."""
    rng = np.random.RandomState(3)
    eps_hat = jnp.asarray(rng.randn(6, 4, 4, 4).astype(np.float32))
    zt = jnp.asarray(rng.randn(6, 4, 4, 4).astype(np.float32))
    t = jnp.asarray([20, 100, 300, 625, 800, 979])
    batched = sched.pred_original_sample(eps_hat, t, zt)
    for i in range(6):
        one = sched.pred_original_sample(eps_hat[i : i + 1], t[i : i + 1], zt[i : i + 1])
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(one[0]), rtol=1e-6)


def test_jit_and_grad():
    sched = DDPMScheduler()

    @jax.jit
    def f(x0, eps, t):
        zt = sched.add_noise(x0, eps, t)
        return jnp.sum(sched.pred_original_sample(eps, t, zt) ** 2)

    g = jax.grad(f)(jnp.ones((2, 4, 4, 4)), jnp.ones((2, 4, 4, 4)), jnp.array([5, 500]))
    assert np.all(np.isfinite(np.asarray(g)))
