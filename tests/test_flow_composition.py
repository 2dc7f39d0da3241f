"""Flow-family plan composition: two-scheduler / interleave / skip on the
rectified-flow (SD3-class) sigma path.

The reference's three experimental pipelines (src/models.py:338-1467) are
defined over VP schedulers; flow<->flow composition is well-defined because
flow Euler rows are memoryless and live on one shared sigma grid — these
tests pin the composed plans against the sigma arithmetic and the float64
oracle, plus the SPACE guard that rejects flow<->VP mixes.
"""

import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.schedulers import (
    DDIMScheduler,
    DPMSolverScheduler,
    FlowMatchEulerScheduler,
    interleave_plan,
    skip_plan,
    two_scheduler_plan,
)
from sonicdiffusionbayeslab_tpu.schedulers.flow import flow_sigmas
from sonicdiffusionbayeslab_tpu.schedulers.plan import reference_apply

T = 1000
SHAPE = (2, 4, 4, 3)


def rnd(seed):
    return np.random.default_rng(seed).standard_normal(SHAPE)


def vel_fn_np(i, t, x):
    r = np.random.default_rng(int(t) + 31)
    return 0.3 * r.standard_normal(x.shape) + 0.1 * x


def test_flow_timesteps_are_shifted_sigmas():
    s = FlowMatchEulerScheduler(shift=3.0)
    ts = s.timesteps(8)
    sig = flow_sigmas(8, shift=3.0, num_train_timesteps=T)
    np.testing.assert_allclose(ts, sig[:-1] * T, rtol=0, atol=0)
    assert ts.dtype == np.float64 and np.all(np.diff(ts) < 0)


# ----------------------------------------------------------------- switch
def test_flow_two_scheduler_plan_structure_and_math():
    first = FlowMatchEulerScheduler(shift=3.0)
    second = FlowMatchEulerScheduler(shift=3.0)
    n, k = 8, 3
    plan = two_scheduler_plan(first, second, n, n, num_step_switch=k,
                              type_switch="closest")
    sig = flow_sigmas(n, shift=3.0, num_train_timesteps=T)
    # Phase 1: rows 0..k-1 on first's grid; phase 2 re-executes the
    # boundary timestep (seeded schedule join, reference models.py:490-502).
    assert [r.tag for r in plan.rows[:k]] == ["phase1"] * k
    assert plan.rows[k].timestep == pytest.approx(plan.rows[k - 1].timestep)
    assert len(plan.rows) == k + (n - (k - 1))
    for i in range(k):
        assert plan.rows[i].timestep == pytest.approx(sig[i] * T)
        assert plan.rows[i].w_eps == pytest.approx(sig[i + 1] - sig[i])
    # Phase 2 rows follow the seeded grid from index k-1 to the end (0.0).
    for j, i in enumerate(range(k - 1, n)):
        r = plan.rows[k + j]
        assert r.timestep == pytest.approx(sig[i] * T)
        assert r.w_eps == pytest.approx(sig[i + 1] - sig[i])
        assert r.cx_eps == pytest.approx(-sig[i])  # x0 = x - sigma v
    # Oracle: the composed plan is exactly Euler integration over the
    # composed transition list.
    x0 = rnd(0)
    got = reference_apply(plan, x0, vel_fn_np)
    x = x0.copy() * plan.init_scale
    trans = list(range(k)) + list(range(k - 1, n))
    for i in trans:
        v = vel_fn_np(0, sig[i] * T, x)
        x = x + (sig[i + 1] - sig[i]) * v
    np.testing.assert_allclose(got, x, rtol=1e-12)


def test_flow_two_scheduler_different_step_counts():
    # Switch from a coarse 4-step schedule into a seeded phase-2 tail —
    # the seeded-schedule semantics keep one shared grid (reference
    # models.py:490-494), so n2 only matters through its composer sweep.
    first = FlowMatchEulerScheduler(shift=3.0)
    second = FlowMatchEulerScheduler(shift=3.0)
    plan = two_scheduler_plan(first, second, 4, 4, num_step_switch=2)
    assert len(plan.rows) == 2 + 3
    assert plan.rows[-1].w_eps == pytest.approx(
        0.0 - flow_sigmas(4, shift=3.0)[-2])


# ------------------------------------------------------------------- skip
def test_flow_skip_plan_keeps_own_transitions():
    s = FlowMatchEulerScheduler(shift=3.0)
    n, skips = 6, [2, 4]
    plan = skip_plan(s, n, skips)
    sig = flow_sigmas(n, shift=3.0, num_train_timesteps=T)
    executed = [0, 1, 3, 5]
    assert len(plan.rows) == len(executed)
    for r, i in zip(plan.rows, executed):
        assert r.timestep == pytest.approx(sig[i] * T)
        assert r.w_eps == pytest.approx(sig[i + 1] - sig[i])
    # The run ends short of sigma=0 by the skipped deltas (DDIM-like
    # timestep-indexed skip semantics, reference models.py:1337-1340).
    total = sum(r.w_eps for r in plan.rows)
    assert total == pytest.approx(
        -(sig[0]) + (sig[2] - sig[3]) + (sig[4] - sig[5]))


# -------------------------------------------------------------- interleave
def test_flow_interleave_ladder_matches_plain_plan():
    # order-1 main: windows swap ownership without deleting steps, so the
    # ladder-mode composition must be numerically identical to the plain
    # flow plan (same executed sigma grid).
    main = FlowMatchEulerScheduler(shift=3.0)
    inter = FlowMatchEulerScheduler(shift=3.0)
    n = 6
    plan = interleave_plan(main, inter, n, [1, 3], mode="ladder")
    plain = main.build_plan(n)
    assert len(plan.rows) == len(plain.rows)
    owners = [r.tag for r in plan.rows]
    assert owners == ["main", "inter", "main", "inter", "main", "main"]
    for a, b in zip(plan.rows, plain.rows):
        assert a.timestep == pytest.approx(b.timestep, rel=1e-6)
        assert a.w_eps == pytest.approx(b.w_eps, rel=1e-6)
        assert a.cx_eps == pytest.approx(b.cx_eps, rel=1e-6)


def test_flow_interleave_preserves_float_timesteps():
    # Flow timesteps are sigma*T floats; the composer must not truncate
    # them to ints (VP grids stay integral).
    main = FlowMatchEulerScheduler(shift=3.0)
    inter = FlowMatchEulerScheduler(shift=3.0)
    plan = interleave_plan(main, inter, 7, [1], mode="ladder")
    sig = flow_sigmas(7, shift=3.0, num_train_timesteps=T)
    for r, s in zip(plan.rows, sig[:-1]):
        assert r.timestep == pytest.approx(s * T, abs=1e-9)


# ------------------------------------------------------------ space guard
def test_space_guard_rejects_flow_vp_mixes():
    flow = FlowMatchEulerScheduler(shift=3.0)
    with pytest.raises(ValueError, match="space"):
        two_scheduler_plan(DDIMScheduler(), flow, 8, 8, num_step_switch=2)
    with pytest.raises(ValueError, match="space"):
        two_scheduler_plan(flow, DPMSolverScheduler(), 8, 8, num_step_switch=2)
    with pytest.raises(ValueError, match="space"):
        interleave_plan(DPMSolverScheduler(), flow, 8, [1], mode="ladder")


# ------------------------------------------------------------- pipelines
def test_sd3_two_scheduler_pipeline_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_3_model_two_schedulers"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32")
    pipe.scheduler_first = FlowMatchEulerScheduler(shift=3.0)
    pipe.scheduler_second = FlowMatchEulerScheduler(shift=3.0)
    imgs, t, x0 = pipe(["a cat"], num_inference_steps=3, num_step_switch=2,
                       guidance_scale=5.0, use_x0=True)
    assert imgs.shape == (1, 16, 16, 3) and t > 0
    assert x0.shape[0] == 3 + 1  # boundary re-executed: 2 + (3 - 1) rows


def test_sd3_skip_pipeline_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_3_model_skip_timesteps"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32")
    pipe.scheduler = FlowMatchEulerScheduler(shift=3.0)
    imgs, _, x0 = pipe(["a cat"], num_inference_steps=4, skip_timesteps=[1],
                       guidance_scale=5.0, use_x0=True)
    assert imgs.shape == (1, 16, 16, 3)
    assert x0.shape[0] == 3  # one skipped step -> 3 executed rows


def test_sd3_interleave_pipeline_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_3_model_interliving_schedulers"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32")
    pipe.scheduler_main = FlowMatchEulerScheduler(shift=3.0)
    pipe.scheduler_inter = FlowMatchEulerScheduler(shift=3.0)
    imgs, _, _ = pipe(["a cat"], num_inference_steps=4, interliving_steps=[1],
                      guidance_scale=5.0)
    assert imgs.shape == (1, 16, 16, 3)
