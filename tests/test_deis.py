"""DEIS-logrho plan rows vs an independent naive implementation (the
published Adams-Bashforth-in-log-rho update, coded directly here), plus
exact-denoiser and pipeline wiring checks."""

import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.schedulers import DEISScheduler
from sonicdiffusionbayeslab_tpu.schedulers.plan import reference_apply
from sonicdiffusionbayeslab_tpu.schedulers.schedule import (
    NoiseSchedule,
    ScheduleConfig,
    space_timesteps,
)

SD = ScheduleConfig()
NS = NoiseSchedule.create(SD)
SHAPE = (2, 4, 4, 4)
RNG = np.random.default_rng(0)
X0_TRUE = RNG.standard_normal(SHAPE)
EPS_HAT = RNG.standard_normal(SHAPE)


def path_sample(t):
    a = np.sqrt(NS.acp(t))
    s = np.sqrt(1 - NS.acp(t))
    return a * X0_TRUE + s * EPS_HAT


def exact_eps(i, t, x):
    a = np.sqrt(NS.acp(t))
    s = np.sqrt(1 - NS.acp(t))
    return (x - a * X0_TRUE) / s


def random_eps_fn(seed):
    def f(i, t, x):
        r = np.random.default_rng(seed * 1000 + int(t))
        return 0.3 * r.standard_normal(x.shape) + 0.1 * x

    return f


# ------------------------------------------------- independent naive DEIS
def naive_deis(ns, num_steps, x, eps_fn, order=2):
    """Direct transcription of DEIS logrho (Zhang & Chen 2022; diffusers
    DEISMultistepScheduler): integrate d(x/alpha)/drho = eps with Lagrange
    polynomials in ln(rho), diffusers' warm-up/demotion bookkeeping."""
    ts = space_timesteps(num_steps, 1000, ns.config.timestep_spacing, ns.config.steps_offset)
    rho = np.sqrt((1 - ns.acp(ts)) / ns.acp(ts))
    rho = np.concatenate([rho, [0.0]])
    alpha = 1 / np.sqrt(1 + rho**2)

    m = [None, None, None]
    lon = 0
    L = len(ts)
    for i, t in enumerate(int(v) for v in ts):
        eps = eps_fn(i, t, x)
        m = [eps] + m[:2]
        lof = i == L - 1  # final_sigmas_type == "zero"
        los = (i == L - 2) and L < 15
        if order == 1 or lon < 1 or lof:
            use = 1
        elif order == 2 or lon < 2 or los:
            use = 2
        else:
            use = 3
        if lon < order:
            lon += 1
        s0, t1 = i, i + 1

        # Numerical quadrature of the Lagrange bases in ln-rho — an
        # implementation path fully independent of deis.py's closed forms.
        nodes = [rho[s0 - j] for j in range(use)]
        lo, hi = rho[t1], rho[s0]
        grid = np.linspace(lo, hi, 20001) if lo > 0 else np.linspace(
            max(hi * 1e-12, 1e-12), hi, 20001
        )
        coefs = []
        for k in range(use):
            if use == 1:
                basis = np.ones_like(grid)
            else:
                basis = np.ones_like(grid)
                for j in range(use):
                    if j == k:
                        continue
                    basis *= (np.log(grid) - np.log(nodes[j])) / (
                        np.log(nodes[k]) - np.log(nodes[j])
                    )
            # signed integral from rho_s0 down to rho_t1
            coefs.append(-np.trapezoid(basis, grid))
        new = x / alpha[s0]
        for k in range(use):
            new = new + coefs[k] * m[k]
        x = alpha[t1] * new
    return x


@pytest.mark.parametrize("order,steps", [(1, 8), (2, 8), (2, 20), (3, 20), (3, 12)])
def test_deis_rows_match_naive(order, steps):
    plan = DEISScheduler(solver_order=order).build_plan(steps)
    eps_fn = random_eps_fn(7)
    x = path_sample(int(plan.timesteps[0]))
    got = reference_apply(plan, x, eps_fn)
    want = naive_deis(NS, steps, x, eps_fn, order=order)
    # Quadrature reference: tolerance bounded by the trapezoid error.
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-7)


def test_deis_order1_equals_ddim_form():
    """First-order DEIS is the exponential-integrator Euler step: with the
    exact denoiser it must land exactly on the clean image."""
    plan = DEISScheduler(solver_order=1).build_plan(6)
    x = path_sample(int(plan.timesteps[0]))
    out = reference_apply(plan, x, exact_eps)
    np.testing.assert_allclose(out, X0_TRUE, rtol=1e-8, atol=1e-10)


def test_deis_exact_denoiser_stays_on_path():
    for order in (2, 3):
        plan = DEISScheduler(solver_order=order).build_plan(10)
        x = path_sample(int(plan.timesteps[0]))
        out = reference_apply(plan, x, exact_eps)
        np.testing.assert_allclose(out, X0_TRUE, rtol=1e-6, atol=1e-8)


def test_deis_x0_capture_and_vpred():
    plan = DEISScheduler(solver_order=2, prediction_type="v_prediction").build_plan(5)
    assert plan.hist_depth == 2
    assert plan.num_steps == 5
    # v-pred ring conversion differs from epsilon's identity.
    assert plan.rows[0].cm_sample != 0.0


def test_deis_composes_in_interleave_plan():
    """DEIS implements ladder_rows, so it composes with the interleaving
    method like DPM does."""
    from sonicdiffusionbayeslab_tpu.schedulers import DDIMScheduler, interleave_plan

    plan = interleave_plan(DEISScheduler(solver_order=2), DDIMScheduler(), 8, [3, 4])
    out = reference_apply(plan, path_sample(int(plan.timesteps[0])), random_eps_fn(5))
    assert np.isfinite(out).all()


def test_deis_method_e2e(tmp_path):
    import yaml

    from sonicdiffusionbayeslab_tpu.cli import run

    cfg = {
        "experiment_name": "t",
        "experiment": {"method": "deis", "seed": 29},
        "model": {"model_name": "stable_diffusion_model", "pretrained_model": "x",
                  "tiny": True, "image_size": 64},
        "scheduler": {"scheduler_name": "deis_scheduler"},
        "dataset": {"prompts": "data/dataset/prompts_sample.json", "image_size": 64},
        "quality_metrics": {"clip_score": {"model_name_or_path": "none"}},
        "logger": {"wandb_enable": False, "log_images_step": 1, "save": False},
        "inference": {"batch_size": 2, "batch_count": 1},
        "experiment_params": {"solver_order": 2, "num_inference_steps": [4]},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    metrics = run(str(p))
    assert len(metrics["exp"]) == 1 and metrics["time"][0] > 0
