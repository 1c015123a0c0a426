"""DPM-Solver++(2M) sampler tests.

The solver is an extra over the reference (which only ships diffusers'
EulerDiscreteScheduler, src/inference/eval_text2img_seed_x_i.py:60); it is
verified here against an independent pure-numpy integration of the same
probability-flow ODE dx/dsigma = eps(x, sigma).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from seedx_tpu.models.sdxl.scheduler import (dpmpp_2m_step, dpmpp_3m_step,
                                             euler_step, karras_sigmas,
                                             make_schedule)


def test_dpmpp_schedule_tables():
    s = make_schedule(15, solver="dpmpp_2m")
    assert s.solver == "dpmpp_2m"
    assert len(s.sigmas) == 16 and s.sigmas[-1] == 0.0
    assert np.all(np.diff(s.sigmas) < 0)
    # Karras spacing by default; init noise is sigma_max (trailing-style).
    assert s.init_noise_sigma == pytest.approx(float(s.sigmas[0]))
    # warm-up and final steps are first-order, the middle is multistep
    assert not s.second_order[0] and not s.second_order[-1]
    assert s.second_order[1:-1].all()
    assert np.isfinite(s.r0).all() and (s.r0 > 0).all()
    # timesteps recovered by log-sigma interp stay in the train range, desc.
    assert np.all(np.diff(s.timesteps) < 0)
    assert 0 <= s.timesteps[-1] and s.timesteps[0] <= 999


def test_dpmpp_3m_schedule_tables():
    s = make_schedule(20, solver="dpmpp_3m")
    assert s.solver == "dpmpp_3m"
    # per-step order warms up 1,2,3,...,3 and the final sigma->0 step is 1
    assert list(s.order[:3]) == [1, 2, 3]
    assert (s.order[2:-1] == 3).all() and s.order[-1] == 1
    # 2M tables are still populated (order-2 steps reuse the midpoint rule)
    assert np.isfinite(s.r0).all() and (s.r0 > 0).all()
    assert np.isfinite(s.r1).all() and (s.r1 > 0).all()
    # third-order coefficients are finite, and zeroed where order < 3
    assert np.isfinite(s.c1).all() and np.isfinite(s.c2).all()
    assert (s.c1[s.order < 3] == 0).all() and (s.c2[s.order < 3] == 0).all()
    assert (np.abs(s.c1[s.order >= 3]) > 0).all()
    # very short schedules also lower the second-to-last step to order 2
    s8 = make_schedule(8, solver="dpmpp_3m")
    assert s8.order[-2] == 2 and s8.order[-1] == 1


def test_karras_sigma_ramp():
    sig = karras_sigmas(0.03, 14.6, 10)
    assert sig[0] == pytest.approx(14.6) and sig[-1] == pytest.approx(0.03)
    assert np.all(np.diff(sig) < 0)
    # rho=7 front-loads large sigmas: the midpoint is far below the mean
    assert sig[5] < (sig[0] + sig[-1]) / 4


def _eps(x, sigma):
    """A smooth nontrivial denoiser: x0_pred = tanh(x)."""
    return (x - np.tanh(x)) / sigma


def _run_solver(solver, n, x_init):
    s = make_schedule(n, solver=solver, karras=True)
    x = jnp.asarray(x_init * s.init_noise_sigma)
    m1 = m2 = jnp.zeros_like(x)
    for i in range(n):
        sig, sig_n = float(s.sigmas[i]), float(s.sigmas[i + 1])
        eps = jnp.asarray(_eps(np.asarray(x, np.float64), sig))
        if solver == "dpmpp_3m":
            x, m1, m2 = dpmpp_3m_step(x, m1, m2, eps, sig, sig_n,
                                      float(s.r0[i]), float(s.r1[i]),
                                      float(s.c1[i]), float(s.c2[i]),
                                      int(s.order[i]))
        elif solver == "dpmpp_2m":
            x, m1 = dpmpp_2m_step(x, m1, eps, sig, sig_n,
                                  float(s.r0[i]),
                                  bool(s.second_order[i]))
        else:
            x = euler_step(x, eps, sig, sig_n)
    return np.asarray(x, np.float64)


def _ground_truth(n_fine, x_init):
    """Independent numpy float64 Euler integration on a fine Karras grid.

    Integrates over the SAME [sigma_max, sigma_min] span the samplers use
    (full-range Karras), then takes the same final sigma->0 jump every
    sampler takes (x -> x0_pred), so the comparison isolates integration
    accuracy rather than the endpoint of this ODE's slow sigma->0 collapse.
    """
    s0 = make_schedule(8, karras=True)      # full-range Karras endpoints
    sig = karras_sigmas(float(s0.sigmas[-2]), float(s0.sigmas[0]), n_fine)
    x = np.asarray(x_init * s0.init_noise_sigma, np.float64)
    for i in range(n_fine - 1):
        x = x + _eps(x, sig[i]) * (sig[i + 1] - sig[i])
    return np.tanh(x)                       # x0_pred at sigma_min


def test_dpmpp_2m_beats_euler_on_the_ode():
    x_init = np.array([1.7, -0.9, 0.3, 2.4])
    gt = _ground_truth(20000, x_init)
    err_euler_10 = np.abs(_run_solver("euler", 10, x_init) - gt).max()
    err_dpm_10 = np.abs(_run_solver("dpmpp_2m", 10, x_init) - gt).max()
    err_euler_30 = np.abs(_run_solver("euler", 30, x_init) - gt).max()
    # the headline claim: 2nd order at 10 steps beats 1st order at 30
    assert err_dpm_10 < err_euler_10 / 2
    assert err_dpm_10 < err_euler_30


def test_dpmpp_3m_beats_2m_on_the_ode():
    """Third order pays off at the step counts sampling uses (>= ~14).

    Convergence study (scratch/dpm3m_coeff_study.py): the canonical 3M
    coefficients show empirical order ~3.3-3.6 on this ODE at n=14-28 vs
    2M's ~2.5-2.9, crossing over between n=10 and n=14.
    """
    x_init = np.array([1.7, -0.9, 0.3, 2.4])
    gt = _ground_truth(20000, x_init)
    for n in (14, 20, 28):
        err_2m = np.abs(_run_solver("dpmpp_2m", n, x_init) - gt).max()
        err_3m = np.abs(_run_solver("dpmpp_3m", n, x_init) - gt).max()
        assert err_3m < err_2m, (n, err_2m, err_3m)


def test_dpmpp_3m_exact_for_constant_x0():
    """eps = (x - c)/sigma: every solver must land exactly on c."""
    c = -0.81
    s = make_schedule(7, solver="dpmpp_3m")
    x = jnp.full((3,), 2.0 * s.init_noise_sigma)
    m1 = m2 = jnp.zeros_like(x)
    for i in range(7):
        sig, sig_n = float(s.sigmas[i]), float(s.sigmas[i + 1])
        eps = (x - c) / sig
        x, m1, m2 = dpmpp_3m_step(x, m1, m2, eps, sig, sig_n,
                                  float(s.r0[i]), float(s.r1[i]),
                                  float(s.c1[i]), float(s.c2[i]),
                                  int(s.order[i]))
    np.testing.assert_allclose(np.asarray(x), c, atol=1e-4)


def test_dpmpp_2m_exact_for_constant_x0():
    """eps = (x - c)/sigma: every solver must land exactly on c."""
    c = 0.37
    s = make_schedule(6, solver="dpmpp_2m")
    x = jnp.full((3,), 2.0 * s.init_noise_sigma)
    prev_x0 = jnp.zeros_like(x)
    for i in range(6):
        sig, sig_n = float(s.sigmas[i]), float(s.sigmas[i + 1])
        eps = (x - c) / sig
        x, prev_x0 = dpmpp_2m_step(x, prev_x0, eps, sig, sig_n,
                                   float(s.r0[i]), bool(s.second_order[i]))
    np.testing.assert_allclose(np.asarray(x), c, atol=1e-4)


def test_pipeline_denoise_dpmpp_tiny():
    """The full jitted denoise scan runs with the dpmpp_2m schedule and
    differs from euler at the same step count."""
    import jax

    from seedx_tpu.models.sdxl.pipeline import (SamplerConfig,
                                                default_time_ids,
                                                denoise_text2image,
                                                prepare_latents)
    from seedx_tpu.models.sdxl.unet import UNet2DCondition, sdxl_debug_unet

    ucfg = sdxl_debug_unet()
    unet = UNet2DCondition(ucfg)
    b, hw = 1, 8
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (b, 4, ucfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, 64))
    sample = jnp.zeros((b, hw, hw, 4))
    tids = default_time_ids(SamplerConfig(), b)
    variables = unet.init(jax.random.PRNGKey(0), sample, jnp.array([1.0]),
                          ctx, pooled, tids)
    scfg = SamplerConfig(height=hw * 8, width=hw * 8, num_inference_steps=4)

    outs = {}
    for solver in ("euler", "dpmpp_2m", "dpmpp_3m"):
        schedule = make_schedule(4, solver=solver)
        latents = prepare_latents(jax.random.PRNGKey(3), b, scfg, schedule)
        out = denoise_text2image(unet, variables["params"], schedule, latents,
                                 ctx, ctx * 0, pooled, pooled * 0, tids)
        assert out.shape == latents.shape
        assert np.isfinite(np.asarray(out, np.float32)).all()
        outs[solver] = np.asarray(out)
    assert np.abs(outs["euler"] - outs["dpmpp_2m"]).max() > 1e-5
    assert np.abs(outs["dpmpp_2m"] - outs["dpmpp_3m"]).max() > 1e-5
