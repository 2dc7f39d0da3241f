"""UniPC plan rows vs an independent mutable-state oracle.

The oracle below re-implements the UniPC-bh update equations directly
(diffusers-style bookkeeping: model-output list, last_sample, per-step
order ramp) in float64, independent of the plan/row machinery, so a fusion
mistake in schedulers/unipc.py cannot cancel itself out.
"""

import jax
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler, UniPCScheduler
from sonicdiffusionbayeslab_tpu.schedulers.dpm import make_ladder
from sonicdiffusionbayeslab_tpu.schedulers.plan import reference_apply
from sonicdiffusionbayeslab_tpu.schedulers.runtime import run_plan
from sonicdiffusionbayeslab_tpu.schedulers.schedule import NoiseSchedule, ScheduleConfig, space_timesteps
from sonicdiffusionbayeslab_tpu.schedulers.unipc import unipc_orders


def _bh(h, n, rks, variant):
    hh = -h
    h_phi_1 = np.expm1(hh)
    B_h = hh if variant == "bh1" else np.expm1(hh)
    R, b = [], []
    h_phi_k = h_phi_1 / hh - 1.0
    fact = 1.0
    for i in range(1, n + 1):
        R.append(rks ** (i - 1))
        b.append(h_phi_k * fact / B_h)
        fact *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / fact
    return np.stack(R), np.asarray(b), h_phi_1, B_h


def unipc_oracle(ladder, x0_latents, eps_fn, solver_order, variant="bh2",
                 use_corrector=True, lower_order_final=True):
    lam, alpha, sig_t, ts = ladder.lam, ladder.alpha, ladder.sigma_t, ladder.ts
    L = len(ts)
    x = np.asarray(x0_latents, np.float64)
    hist = []  # converted model outputs, most recent LAST
    last_sample, this_order, lon = None, None, 0

    def uni_p(x, k, p):
        s0, t = k, k + 1
        h = lam[t] - lam[s0]
        rks = np.array([(lam[s0 - i] - lam[s0]) / h for i in range(1, p)] + [1.0])
        m0 = hist[-1]
        D1s = [(hist[-1 - i] - m0) / rks[i - 1] for i in range(1, p)]
        _, _, h_phi_1, B_h = _bh(h, 1, rks, variant)
        x_t = sig_t[t] / sig_t[s0] * x - alpha[t] * h_phi_1 * m0
        if p >= 2:
            if p == 2:
                rhos = np.array([0.5])
            else:
                R, b, _, _ = _bh(h, p, rks, variant)
                rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred = sum(r * d for r, d in zip(rhos, D1s))
            x_t = x_t - alpha[t] * B_h * pred
        return x_t

    def uni_c(x_t_in, last, m_t, k, q):
        s0, t = k - 1, k
        h = lam[t] - lam[s0]
        rks = np.array([(lam[s0 - i] - lam[s0]) / h for i in range(1, q)] + [1.0])
        m0 = hist[-1]
        D1s = [(hist[-1 - i] - m0) / rks[i - 1] for i in range(1, q)]
        if q == 1:
            rhos = np.array([0.5])
            _, _, h_phi_1, B_h = _bh(h, 1, rks, variant)
        else:
            R, b, h_phi_1, B_h = _bh(h, q, rks, variant)
            rhos = np.linalg.solve(R, b)
        out = sig_t[t] / sig_t[s0] * last - alpha[t] * h_phi_1 * m0
        corr = sum(r * d for r, d in zip(rhos[:-1], D1s))
        out = out - alpha[t] * B_h * (corr + rhos[-1] * (m_t - m0))
        return out

    for k in range(L):
        eps = eps_fn(k, int(ts[k]), x)
        m = x / alpha[k] - sig_t[k] / alpha[k] * eps  # x0 (epsilon pred)
        if use_corrector and k > 0:
            x = uni_c(x, last_sample, m, k, this_order)
        hist.append(m)
        this = min(solver_order, L - k) if lower_order_final else solver_order
        this_order = max(1, min(this, lon + 1))
        last_sample = x
        x = uni_p(x, k, this_order)
        if lon < solver_order:
            lon += 1
    return x


def _toy(num_steps):
    cfg = ScheduleConfig()
    schedule = NoiseSchedule.create(cfg)
    ts = space_timesteps(num_steps, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset)
    ladder = make_ladder(schedule, ts, "zero")
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(6)

    def eps_fn(k, t, x):
        # Nonlinear, step/time dependent: exercises history + corrector.
        return np.tanh(x) * 0.3 + np.sin(t / 100.0) * 0.1 + 0.01 * k

    return schedule, ladder, x0, eps_fn


@pytest.mark.parametrize("order,variant,corrector", [
    (1, "bh2", False),
    (1, "bh2", True),
    (2, "bh2", True),
    (2, "bh1", True),
    (3, "bh2", True),
    (2, "bh2", False),
])
def test_unipc_plan_matches_oracle(order, variant, corrector):
    num_steps = 9
    schedule, ladder, x0, eps_fn = _toy(num_steps)
    sched = UniPCScheduler(solver_order=order, variant=variant, use_corrector=corrector)
    plan = sched.build_plan(num_steps)
    got = reference_apply(plan, x0, eps_fn)
    want = unipc_oracle(ladder, x0, eps_fn, order, variant, corrector)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_unipc_jitted_matches_oracle():
    import jax.numpy as jnp

    num_steps = 7
    schedule, ladder, x0, eps_fn = _toy(num_steps)
    plan = UniPCScheduler(solver_order=2).build_plan(num_steps)
    ts_arr = jnp.asarray(plan.timesteps, jnp.float32)

    def eps_jax(t, lat):
        k = jnp.argmax(ts_arr == t.astype(jnp.float32))
        return jnp.tanh(lat) * 0.3 + jnp.sin(t.astype(jnp.float32) / 100.0) * 0.1 + 0.01 * k

    final = jax.jit(lambda x: run_plan(plan, x, eps_jax))(jnp.asarray(x0, jnp.float32))
    want = unipc_oracle(ladder, x0, eps_fn, 2)
    np.testing.assert_allclose(np.asarray(final), want, rtol=2e-4, atol=2e-5)


def test_unip1_no_corrector_equals_dpmpp1():
    num_steps = 6
    schedule, ladder, x0, eps_fn = _toy(num_steps)
    uni = UniPCScheduler(solver_order=1, use_corrector=False).build_plan(num_steps)
    dpm = DPMSolverScheduler(solver_order=1).build_plan(num_steps)
    np.testing.assert_allclose(
        reference_apply(uni, x0, eps_fn),
        reference_apply(dpm, x0, eps_fn),
        rtol=1e-12,
    )


def test_unipc_order_ramp():
    assert unipc_orders(6, 2) == [1, 2, 2, 2, 2, 1]
    assert unipc_orders(6, 3) == [1, 2, 3, 3, 2, 1]
    assert unipc_orders(3, 3, lower_order_final=False) == [1, 2, 3]


def test_unipc_corrector_improves_accuracy():
    """On a linear ODE with known exact solution the corrected trajectory
    must be closer to the exact endpoint than the uncorrected one."""
    num_steps = 8
    cfg = ScheduleConfig()
    schedule = NoiseSchedule.create(cfg)
    ts = space_timesteps(num_steps, cfg.num_train_timesteps, cfg.timestep_spacing, cfg.steps_offset)
    ladder = make_ladder(schedule, ts, "zero")
    x_target = np.array([0.7, -1.2, 0.4])

    # Model whose x0-prediction is exactly x_target: eps = (x - a*x_t)/s.
    acp = schedule.alphas_cumprod

    def eps_fn(k, t, x):
        a, s = np.sqrt(acp[int(t)]), np.sqrt(1.0 - acp[int(t)])
        return (x - a * x_target) / s

    x_init = np.array([3.0, -2.0, 0.5])
    # Exact probability-flow endpoint at sigma->0 is x_target itself.
    for corrector in (False, True):
        plan = UniPCScheduler(solver_order=2, use_corrector=corrector).build_plan(num_steps)
        final = reference_apply(plan, x_init, eps_fn)
        err = np.abs(final - x_target).max()
        if corrector:
            err_c = err
        else:
            err_p = err
    assert err_c <= err_p + 1e-9
    assert err_c < 1e-6
