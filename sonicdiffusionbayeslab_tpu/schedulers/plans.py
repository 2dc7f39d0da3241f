"""Plan composers: single / two-scheduler switch / interleave / skip-steps.

These are the TPU re-design of the reference's three experimental pipelines
(``src/models.py``: StableDiffusionModelTwoSchedulers 338-730,
...InterlivingSchedulers 733-1135, ...SkipTimesteps 1138-1467): what the
reference does with in-loop Python branching over mutable scheduler objects
becomes *pure integer/float plan composition* here — trivially unit-testable
and invisible to XLA (the compiled scan is identical for every composition).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from sonicdiffusionbayeslab_tpu.schedulers.plan import SamplePlan, StepRow, stack_rows


def join_index(ts_second: np.ndarray, last_first: int, type_switch: str) -> int:
    """Where schedule 2 picks up after schedule 1 stops at ``last_first``.

    Mirrors reference ``switch_timestamp`` (src/models.py:704-730):
    ``closest`` = argmin |t - last|; ``left_closest`` = last index with
    t >= last; ``right_closest`` = first index with t <= last.  (Timesteps
    descend, so all three coincide when the schedules share timesteps.)
    """
    ts = np.asarray(ts_second)
    if type_switch == "closest":
        return int(np.argmin(np.abs(ts - last_first)))
    if type_switch == "left_closest":
        idx = np.nonzero(ts - last_first >= 0)[0]
        if len(idx) == 0:
            return 0
        return int(idx[-1])
    if type_switch == "right_closest":
        idx = np.nonzero(ts - last_first <= 0)[0]
        if len(idx) == 0:
            return len(ts) - 1
        return int(idx[0])
    raise ValueError(f"unknown type_switch {type_switch!r}")


def two_scheduler_plan(
    first,
    second,
    num_inference_steps_first: int,
    num_inference_steps_second: int,
    num_step_switch: int,
    type_switch: str = "closest",
) -> SamplePlan:
    """Phase 1 on ``first`` for ``num_step_switch`` steps, then join to
    ``second``'s schedule.

    Reference semantics kept: schedule 2's timesteps are *seeded from
    schedule 1's* (src/models.py:490-494 passes timesteps_first into the
    second scheduler's set_timesteps), so the join re-executes the boundary
    timestep with scheduler 2; scheduler 2's multistep warm-up starts from
    zero at the join (its ``lower_order_nums`` was never advanced in phase 1)
    while its history ring carries the phase-1 x0 pushes
    (src/models.py:603-611) — in this design, one *shared* ring.
    """
    ts1 = first.timesteps(num_inference_steps_first)
    k = int(num_step_switch)
    if not 1 <= k <= len(ts1):
        raise ValueError(f"num_step_switch {k} out of range for {len(ts1)} steps")
    ts2 = ts1.copy()  # seeded schedule (see docstring)
    j = join_index(ts2, int(ts1[k - 1]), type_switch)

    rows: List[StepRow] = []
    rows += first.transition_rows(
        ts1, num_inference_steps_first, executed=range(k), tag="phase1"
    )
    rows += second.transition_rows_from_schedule(ts2, start=j, tag="phase2")
    plan = stack_rows(
        rows,
        name=f"two_scheduler[{first.NAME}->{second.NAME}]"
        f"(n1={num_inference_steps_first},switch={k},{type_switch})",
    )
    return plan


def interleave_plan(
    main,
    inter,
    num_inference_steps: int,
    interliving_steps: Sequence[int],
) -> SamplePlan:
    """Interleaved-scheduler plan.

    Reference behavior (src/models.py:879-956): the main schedule is divided
    into windows of ``solver_order`` steps; inside each window listed in
    ``interliving_steps`` only the first step runs — handled by the *inter*
    scheduler — and the rest are deleted; both schedulers' multistep
    histories are kept in sync (src/models.py:1025-1053).

    Divergence (documented): the reference resolves the inter scheduler's
    noise level by looking the main-schedule timestep up in the inter
    scheduler's own (coarser) schedule, falling back to its final index on a
    miss — an index-mismatch artifact of mutable diffusers state.  Here each
    executed step transitions along the *executed ladder* (its true noise
    levels), which is the well-defined version of the same experiment.
    """
    order = getattr(main, "solver_order", 1)
    ts_main = main.timesteps(num_inference_steps)
    windows = set(int(w) for w in interliving_steps)

    entries = []  # (timestep, owner)
    for i, t in enumerate(int(x) for x in ts_main):
        if i // order in windows:
            if i % order == 0:
                entries.append((t, "inter"))
        else:
            entries.append((t, "main"))
    if not entries:
        raise ValueError("interleave plan deleted every step")

    ts_exec = np.asarray([t for t, _ in entries], dtype=np.int64)
    owners = [o for _, o in entries]
    rows: List[StepRow] = [None] * len(entries)  # type: ignore[list-item]

    for owner, sched in (("main", main), ("inter", inter)):
        positions = [i for i, o in enumerate(owners) if o == owner]
        if not positions:
            continue
        sched_rows = sched.ladder_rows(ts_exec, positions, tag=owner)
        for pos, row in zip(positions, sched_rows):
            rows[pos] = row
    plan = stack_rows(
        rows,
        name=f"interleave[{main.NAME}+{inter.NAME}]"
        f"(n={num_inference_steps},windows={sorted(windows)})",
    )
    return plan


def skip_plan(scheduler, num_inference_steps: int, skip_steps: Sequence[int]) -> SamplePlan:
    """Skip-steps plan: listed step indices are never executed.

    Reference semantics kept exactly (src/models.py:1337-1340 + diffusers
    ``_step_index`` bookkeeping): for position-indexed schedulers (DPM) the
    executed steps advance *consecutive* ladder positions starting at the
    first executed index, while the UNet is conditioned on the original
    schedule's timesteps — so with skips the run ends short of sigma=0.
    Timestep-indexed schedulers (DDIM) simply drop those transitions.
    """
    skip = set(int(s) for s in skip_steps)
    executed = [i for i in range(num_inference_steps) if i not in skip]
    if not executed:
        raise ValueError("skip plan executes no steps")
    rows = scheduler.skip_rows(num_inference_steps, executed, tag="skip")
    return stack_rows(
        rows,
        name=f"skip[{scheduler.NAME}](n={num_inference_steps},skip={sorted(skip)})",
    )
