"""Scheduler registry classes (parity names: reference ``src/registry.py`` +
``src/schedulers.py`` — ``dpm_solver_scheduler``, ``ddim_scheduler``,
``lcm_scheduler`` — plus ``pndm_scheduler``, SD-1.5's default pipeline
scheduler that the reference's ``default`` method relies on implicitly).

Each class is a thin *plan builder* around the pure row builders: it holds
schedule constants and solver options, and emits :class:`SamplePlan`s.  No
mutable per-run state exists anywhere — the plan is the run.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from sonicdiffusionbayeslab_tpu.registry import schedulers_registry
from sonicdiffusionbayeslab_tpu.schedulers import plans  # noqa: F401  (re-export)
from sonicdiffusionbayeslab_tpu.schedulers.ddim import ddim_rows, ddim_transition_row
from sonicdiffusionbayeslab_tpu.schedulers.dpm import (
    dpm_rows,
    make_karras_ladder,
    make_ladder,
    simulate_orders,
)
from sonicdiffusionbayeslab_tpu.schedulers.lcm import lcm_rows
from sonicdiffusionbayeslab_tpu.schedulers.plan import SamplePlan, stack_rows
from sonicdiffusionbayeslab_tpu.schedulers.plans import (  # noqa: F401
    interleave_plan,
    skip_plan,
    two_scheduler_plan,
)
from sonicdiffusionbayeslab_tpu.schedulers.euler import euler_rows, heun_rows
from sonicdiffusionbayeslab_tpu.schedulers.flow import flow_euler_rows, flow_sigmas
from sonicdiffusionbayeslab_tpu.schedulers.pndm import pndm_rows
from sonicdiffusionbayeslab_tpu.schedulers.unipc import unipc_rows
from sonicdiffusionbayeslab_tpu.schedulers.schedule import (
    NoiseSchedule,
    ScheduleConfig,
    space_timesteps,
)

__all__ = [
    "ScheduleConfig",
    "NoiseSchedule",
    "SamplePlan",
    "StepRow",
    "DDIMScheduler",
    "DEISScheduler",
    "DPMSolverScheduler",
    "LCMScheduler",
    "PNDMScheduler",
    "UniPCScheduler",
    "EulerScheduler",
    "EulerAncestralScheduler",
    "FlowMatchEulerScheduler",
    "HeunScheduler",
    "two_scheduler_plan",
    "interleave_plan",
    "skip_plan",
]


class _PlanBuilder:
    NAME = "base"
    # Sample space of the carried latent — plan composers only join
    # schedulers living in the same space (a VP sample a_t x0 + s_t eps, a
    # k-diffusion sigma-space sample x0 + sigma eps, and a flow-path sample
    # (1-sigma) x0 + sigma eps are different parameterizations; handing one
    # scheduler's carry to another's row is undefined math, not a feature).
    SPACE = "vp"

    def __init__(self, schedule_config=None, prediction_type: Optional[str] = None):
        base = ScheduleConfig.from_dict(schedule_config or {})
        if prediction_type is not None:
            import dataclasses

            base = dataclasses.replace(base, prediction_type=prediction_type)
        self.schedule = NoiseSchedule.create(base)
        self.config = base

    @classmethod
    def from_config(cls, schedule_config, **kwargs):
        """Parity shim for the reference's ``from_config(pipe.scheduler.config,
        **kw)`` construction (src/experiments/base_experiment.py:66-72)."""
        return cls(schedule_config=schedule_config, **kwargs)

    def timesteps(self, num_steps: int) -> np.ndarray:
        return space_timesteps(
            num_steps,
            self.config.num_train_timesteps,
            self.config.timestep_spacing,
            self.config.steps_offset,
        )

    def build_plan(self, num_steps: int) -> SamplePlan:
        raise NotImplementedError

    # ---- img2img hooks ----------------------------------------------------
    def tail_plan(self, num_steps: int, start_index: int) -> SamplePlan:
        """Plan executing only steps[start_index:] of an num_steps schedule
        (img2img / strength semantics).  Default: row slicing — correct for
        memoryless-row samplers (DDIM, Euler family, LCM); multistep
        builders override to re-simulate their warm-up from the start row."""
        if start_index == 0:
            return self.build_plan(num_steps)
        return self.build_plan(num_steps).tail(start_index)

    def noised_latents(self, z, noise, num_steps: int, start_index: int):
        """Seed latents for ``tail_plan``: z noised to the start step's
        level in this sampler's native space (VP default: a_t z + s_t eps)."""
        t = int(self.timesteps(num_steps)[start_index])
        a, s = self.schedule.alpha_sigma(t)
        return float(a) * z + float(s) * noise

    def blend_schedule(self, num_steps: int, start_index: int = 0):
        """(a[R], s[R]) aligned with ``tail_plan(num_steps, start_index)``'s
        rows: the source image z re-noised to row k's *output* level is
        ``a[k] z + s[k] noise`` in native space — the inpainting blend
        targets (legacy masked-img2img semantics).  Ends clean (1, 0)."""
        ts = self.timesteps(num_steps)
        a, s = [], []
        for k in range(start_index, num_steps):
            if k + 1 < num_steps:
                ak, sk = self.schedule.alpha_sigma(int(ts[k + 1]))
                a.append(float(ak)), s.append(float(sk))
            else:
                a.append(1.0), s.append(0.0)
        return np.asarray(a, np.float32), np.asarray(s, np.float32)

    # Composer hooks; overridden where supported.
    def transition_rows(self, ts, num_steps, executed, tag=""):
        raise NotImplementedError(f"{self.NAME} cannot be composed this way")

    def transition_rows_from_schedule(self, ts, start, tag=""):
        raise NotImplementedError(f"{self.NAME} cannot be composed this way")

    def ladder_rows(self, ts_exec, positions, tag=""):
        raise NotImplementedError(f"{self.NAME} cannot be interleaved")

    def skip_rows(self, num_steps, executed, tag=""):
        raise NotImplementedError(f"{self.NAME} does not support skip plans")


@schedulers_registry.add_to_registry("ddim_scheduler")
class DDIMScheduler(_PlanBuilder):
    NAME = "ddim"

    def __init__(self, schedule_config=None, prediction_type=None, eta: float = 0.0):
        super().__init__(schedule_config, prediction_type)
        self.eta = float(eta)

    def build_plan(self, num_steps: int) -> SamplePlan:
        rows = ddim_rows(
            self.schedule,
            self.timesteps(num_steps),
            num_steps,
            eta=self.eta,
            prediction_type=self.config.prediction_type,
        )
        return stack_rows(rows, name=f"ddim(n={num_steps})")

    def transition_rows(self, ts, num_steps, executed, tag=""):
        return ddim_rows(
            self.schedule,
            ts,
            num_steps,
            eta=self.eta,
            prediction_type=self.config.prediction_type,
            executed=executed,
            tag=tag,
        )

    def transition_rows_from_schedule(self, ts, start, tag=""):
        # Seeded-schedule phase: transitions follow the given timestep list.
        rows = []
        for i in range(start, len(ts)):
            prev_t = int(ts[i + 1]) if i + 1 < len(ts) else -1
            rows.append(
                ddim_transition_row(
                    self.schedule,
                    int(ts[i]),
                    prev_t,
                    eta=self.eta,
                    prediction_type=self.config.prediction_type,
                    tag=tag,
                )
            )
        return rows

    def ladder_rows(self, ts_exec, positions, tag=""):
        rows = []
        for p in positions:
            prev_t = int(ts_exec[p + 1]) if p + 1 < len(ts_exec) else -1
            rows.append(
                ddim_transition_row(
                    self.schedule,
                    int(ts_exec[p]),
                    prev_t,
                    eta=self.eta,
                    prediction_type=self.config.prediction_type,
                    tag=tag,
                )
            )
        return rows

    def skip_rows(self, num_steps, executed, tag=""):
        return ddim_rows(
            self.schedule,
            self.timesteps(num_steps),
            num_steps,
            eta=self.eta,
            prediction_type=self.config.prediction_type,
            executed=executed,
            tag=tag,
        )


class _MultistepLadderScheduler(_PlanBuilder):
    """Shared body for ladder-based multistep exponential integrators (DPM,
    DEIS): Karras/linear ladders, tail re-simulation from an empty history,
    order warm-up/demotion bookkeeping, and every composer hook.  Subclasses
    set ``_rows`` (the row-expansion function) and extend ``_kw``."""

    PLAN_PREFIX = "multistep"

    def __init__(
        self,
        schedule_config=None,
        prediction_type=None,
        solver_order: int = 2,
        final_sigmas_type: str = "zero",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        use_karras_sigmas: bool = False,
    ):
        super().__init__(schedule_config, prediction_type)
        if solver_order not in (1, 2, 3):
            raise ValueError(f"solver_order must be 1-3, got {solver_order}")
        self.solver_order = int(solver_order)
        self.final_sigmas_type = final_sigmas_type
        self.lower_order_final = bool(lower_order_final)
        self.euler_at_final = bool(euler_at_final)
        self.use_karras_sigmas = bool(use_karras_sigmas)

    @staticmethod
    def _rows(schedule, ladder, positions, **kw):
        raise NotImplementedError

    def _kw(self):
        return dict(
            solver_order=self.solver_order,
            final_sigmas_type=self.final_sigmas_type,
            prediction_type=self.config.prediction_type,
            lower_order_final=self.lower_order_final,
            euler_at_final=self.euler_at_final,
        )

    def _ladder(self, num_steps: int):
        if self.use_karras_sigmas:
            return make_karras_ladder(self.schedule, num_steps, self.final_sigmas_type)
        return make_ladder(self.schedule, self.timesteps(num_steps), self.final_sigmas_type)

    def build_plan(self, num_steps: int) -> SamplePlan:
        return self.tail_plan(num_steps, 0)

    def tail_plan(self, num_steps: int, start_index: int) -> SamplePlan:
        # Re-simulate from the start row (empty history -> order warm-up),
        # exactly what a freshly-seeded multistep scheduler would do.
        ladder = self._ladder(num_steps)
        rows = self._rows(self.schedule, ladder, range(start_index, num_steps), **self._kw())
        kar = "-karras" if self.use_karras_sigmas else ""
        sfx = f"[{start_index}:]" if start_index else ""
        return stack_rows(
            rows,
            name=f"{self.PLAN_PREFIX}{self.solver_order}{kar}(n={num_steps}){sfx}",
            hist_depth=self.solver_order,
        )

    def noised_latents(self, z, noise, num_steps: int, start_index: int):
        ladder = self._ladder(num_steps)
        a, st = float(ladder.alpha[start_index]), float(ladder.sigma_t[start_index])
        return a * z + st * noise

    def blend_schedule(self, num_steps: int, start_index: int = 0):
        ladder = self._ladder(num_steps)
        idx = np.arange(start_index + 1, num_steps + 1)
        return (np.asarray(ladder.alpha[idx], np.float32),
                np.asarray(ladder.sigma_t[idx], np.float32))

    def transition_rows(self, ts, num_steps, executed, tag=""):
        ladder = make_ladder(self.schedule, ts, self.final_sigmas_type)
        return self._rows(self.schedule, ladder, list(executed), tag=tag, **self._kw())

    def transition_rows_from_schedule(self, ts, start, tag=""):
        ladder = make_ladder(self.schedule, ts, self.final_sigmas_type)
        return self._rows(
            self.schedule, ladder, range(start, len(ts)), tag=tag, **self._kw()
        )

    def ladder_rows(self, ts_exec, positions, tag=""):
        ladder = make_ladder(self.schedule, ts_exec, self.final_sigmas_type)
        orders = simulate_orders(
            positions,
            len(ts_exec),
            self.solver_order,
            lower_order_final=self.lower_order_final,
            euler_at_final=self.euler_at_final,
            final_sigmas_type=self.final_sigmas_type,
        )
        # History availability: every executed step pushes into the shared
        # ring, so at the k-th listed position there are >= k prior entries;
        # simulate_orders already caps the order at k+1 via lower_order_nums.
        return self._rows(self.schedule, ladder, positions, orders=orders, tag=tag,
                          **self._kw())

    def skip_rows(self, num_steps, executed, tag=""):
        ts = self.timesteps(num_steps)
        ladder = make_ladder(self.schedule, ts, self.final_sigmas_type)
        first = executed[0]
        positions = [first + k for k in range(len(executed))]
        unet_ts = [int(ts[i]) for i in executed]
        return self._rows(
            self.schedule, ladder, positions, unet_timesteps=unet_ts, tag=tag, **self._kw()
        )


@schedulers_registry.add_to_registry("dpm_solver_scheduler")
class DPMSolverScheduler(_MultistepLadderScheduler):
    NAME = "dpm_solver"
    PLAN_PREFIX = "dpm"

    def __init__(
        self,
        schedule_config=None,
        prediction_type=None,
        solver_order: int = 2,
        algorithm_type: str = "dpmsolver++",
        solver_type: str = "midpoint",
        final_sigmas_type: str = "zero",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        use_karras_sigmas: bool = False,
    ):
        super().__init__(
            schedule_config, prediction_type,
            solver_order=solver_order, final_sigmas_type=final_sigmas_type,
            lower_order_final=lower_order_final, euler_at_final=euler_at_final,
            use_karras_sigmas=use_karras_sigmas,
        )
        self.algorithm_type = algorithm_type
        self.solver_type = solver_type

    _rows = staticmethod(dpm_rows)

    def _kw(self):
        kw = super()._kw()
        kw.update(algorithm_type=self.algorithm_type, solver_type=self.solver_type)
        return kw


@schedulers_registry.add_to_registry("deis_scheduler")
class DEISScheduler(_MultistepLadderScheduler):
    """DEIS logrho multistep (beyond-reference; schedulers/deis.py).
    Entirely the shared multistep-ladder body — only the row expansion
    differs from DPM."""

    NAME = "deis"
    PLAN_PREFIX = "deis"

    @staticmethod
    def _rows(schedule, ladder, positions, **kw):
        from sonicdiffusionbayeslab_tpu.schedulers.deis import deis_rows

        return deis_rows(schedule, ladder, positions, **kw)


@schedulers_registry.add_to_registry("lcm_scheduler")
class LCMScheduler(_PlanBuilder):
    NAME = "lcm"

    def __init__(
        self,
        schedule_config=None,
        prediction_type=None,
        original_inference_steps: int = 50,
        timestep_scaling: float = 10.0,
        sigma_data: float = 0.5,
    ):
        super().__init__(schedule_config, prediction_type)
        self.original_inference_steps = int(original_inference_steps)
        self.timestep_scaling = float(timestep_scaling)
        self.sigma_data = float(sigma_data)

    def build_plan(self, num_steps: int) -> SamplePlan:
        rows = lcm_rows(
            self.schedule,
            num_steps,
            original_inference_steps=self.original_inference_steps,
            timestep_scaling=self.timestep_scaling,
            sigma_data=self.sigma_data,
            prediction_type=self.config.prediction_type,
        )
        return stack_rows(rows, name=f"lcm(n={num_steps})")


@schedulers_registry.add_to_registry("unipc_scheduler")
class UniPCScheduler(_PlanBuilder):
    """UniPC multistep (beyond-reference; see schedulers/unipc.py)."""

    NAME = "unipc"

    def __init__(
        self,
        schedule_config=None,
        prediction_type=None,
        solver_order: int = 2,
        variant: str = "bh2",
        use_corrector: bool = True,
        lower_order_final: bool = True,
        final_sigmas_type: str = "zero",
        use_karras_sigmas: bool = False,
    ):
        super().__init__(schedule_config, prediction_type)
        if solver_order < 1:
            raise ValueError(f"solver_order must be >= 1, got {solver_order}")
        self.solver_order = int(solver_order)
        self.variant = variant
        self.use_corrector = bool(use_corrector)
        self.lower_order_final = bool(lower_order_final)
        self.final_sigmas_type = final_sigmas_type
        self.use_karras_sigmas = bool(use_karras_sigmas)

    def _ladder(self, num_steps: int):
        if self.use_karras_sigmas:
            return make_karras_ladder(self.schedule, num_steps, self.final_sigmas_type)
        return make_ladder(self.schedule, self.timesteps(num_steps), self.final_sigmas_type)

    def build_plan(self, num_steps: int) -> SamplePlan:
        return self.tail_plan(num_steps, 0)

    def tail_plan(self, num_steps: int, start_index: int) -> SamplePlan:
        ladder = self._ladder(num_steps)
        rows = unipc_rows(
            self.schedule,
            ladder,
            range(start_index, num_steps),
            solver_order=self.solver_order,
            variant=self.variant,
            use_corrector=self.use_corrector,
            lower_order_final=self.lower_order_final,
            prediction_type=self.config.prediction_type,
        )
        kar = "-karras" if self.use_karras_sigmas else ""
        sfx = f"[{start_index}:]" if start_index else ""
        return stack_rows(
            rows,
            name=f"unipc{self.solver_order}-{self.variant}{kar}(n={num_steps}){sfx}",
            hist_depth=self.solver_order + 1,
        )

    def noised_latents(self, z, noise, num_steps: int, start_index: int):
        ladder = self._ladder(num_steps)
        a, st = float(ladder.alpha[start_index]), float(ladder.sigma_t[start_index])
        return a * z + st * noise

    def blend_schedule(self, num_steps: int, start_index: int = 0):
        ladder = self._ladder(num_steps)
        idx = np.arange(start_index + 1, num_steps + 1)
        return (np.asarray(ladder.alpha[idx], np.float32),
                np.asarray(ladder.sigma_t[idx], np.float32))


@schedulers_registry.add_to_registry("euler_scheduler")
class EulerScheduler(_PlanBuilder):
    """Euler discrete, sigma-space (beyond-reference; schedulers/euler.py)."""

    NAME = "euler"
    ANCESTRAL = False
    SPACE = "sigma"

    def __init__(self, schedule_config=None, prediction_type=None,
                 use_karras_sigmas: bool = False):
        super().__init__(schedule_config, prediction_type)
        self.use_karras_sigmas = bool(use_karras_sigmas)

    def _grid(self, num_steps: int):
        """(ts, sigmas[len+1], init_noise_sigma) for the full schedule."""
        from sonicdiffusionbayeslab_tpu.schedulers.euler import euler_sigmas
        from sonicdiffusionbayeslab_tpu.schedulers.schedule import karras_sigmas, sigma_to_t

        if self.use_karras_sigmas:
            table = np.sqrt((1.0 - self.schedule.alphas_cumprod) / self.schedule.alphas_cumprod)
            sig = karras_sigmas(float(table[0]), float(table[-1]), num_steps)
            ts = sigma_to_t(self.schedule, sig)
            sigmas = np.concatenate([sig, [0.0]])
        else:
            ts = self.timesteps(num_steps)
            sigmas = euler_sigmas(self.schedule, ts)
        init = float(sigmas[0] if self.config.timestep_spacing in ("linspace", "trailing")
                     else np.sqrt(sigmas[0] ** 2 + 1.0))
        return ts, sigmas, init

    def build_plan(self, num_steps: int) -> SamplePlan:
        return self.tail_plan(num_steps, 0)

    def tail_plan(self, num_steps: int, start_index: int) -> SamplePlan:
        ts, sigmas, init = self._grid(num_steps)
        rows = euler_rows(
            self.schedule, ts[start_index:],
            ancestral=self.ANCESTRAL,
            prediction_type=self.config.prediction_type,
            sigmas=sigmas[start_index:],
        )
        kar = "-karras" if self.use_karras_sigmas else ""
        sfx = f"[{start_index}:]" if start_index else ""
        return stack_rows(
            rows,
            name=f"{self.NAME}{kar}(n={num_steps}){sfx}",
            init_scale=init if start_index == 0 else 1.0,
        )

    def noised_latents(self, z, noise, num_steps: int, start_index: int):
        """sigma-space seeding: x = z + sigma_start * noise."""
        _, sigmas, _ = self._grid(num_steps)
        return z + float(sigmas[start_index]) * noise

    def blend_schedule(self, num_steps: int, start_index: int = 0):
        _, sigmas, _ = self._grid(num_steps)
        s = np.asarray(sigmas[start_index + 1:], np.float32)
        return np.ones_like(s), s


@schedulers_registry.add_to_registry("euler_ancestral_scheduler")
class EulerAncestralScheduler(EulerScheduler):
    NAME = "euler_ancestral"
    ANCESTRAL = True


@schedulers_registry.add_to_registry("heun_scheduler")
class HeunScheduler(EulerScheduler):
    """Heun 2nd-order (2 NFE per transition; schedulers/euler.py)."""

    NAME = "heun"

    def tail_plan(self, num_steps: int, start_index: int) -> SamplePlan:
        ts, sigmas, init = self._grid(num_steps)
        rows = heun_rows(
            self.schedule, ts[start_index:],
            prediction_type=self.config.prediction_type,
            sigmas=sigmas[start_index:],
        )
        kar = "-karras" if self.use_karras_sigmas else ""
        sfx = f"[{start_index}:]" if start_index else ""
        return stack_rows(rows, name=f"heun{kar}(n={num_steps}){sfx}",
                          init_scale=init if start_index == 0 else 1.0)

    def blend_schedule(self, num_steps: int, start_index: int = 0):
        # Per ROW: both rows of a transition output at the target sigma.
        _, sigmas, _ = self._grid(num_steps)
        s = []
        for k in range(start_index, num_steps):
            s2 = float(sigmas[k + 1])
            s.extend([s2] if s2 == 0.0 else [s2, s2])
        s = np.asarray(s, np.float32)
        return np.ones_like(s), s


@schedulers_registry.add_to_registry("flow_match_euler_scheduler")
class FlowMatchEulerScheduler(_PlanBuilder):
    """Rectified-flow Euler (schedulers/flow.py) — the sampler for
    SD3-class flow-matching transformers (models/mmdit.py).  Not a VP
    scheduler: the carried sample lives on the linear path
    ``x = (1-sigma) x0 + sigma eps`` and the model predicts velocity.

    ``shift`` is the resolution shift of the sigma grid (Esser et al.
    2024; 3.0 = SD3-medium's shipped value).

    Plan composition (two-scheduler / interleave / skip, the reference's
    three experimental pipelines, src/models.py:338-1467): every hook is
    implemented for flow<->flow composition — Euler rows are memoryless and
    the sigma path is shared, so switch joins, interleave ladders and skip
    plans are all well-defined single-row math.  Flow<->VP mixes are
    rejected by the composers' SPACE guard (the carried sample lives on a
    different path; see :class:`_PlanBuilder`.SPACE)."""

    NAME = "flow_euler"
    SPACE = "flow"

    def __init__(self, schedule_config=None, prediction_type=None,
                 shift: float = 3.0):
        cfg = dict(schedule_config or {})
        self.shift = float(cfg.pop("shift", shift))
        super().__init__(cfg, prediction_type)

    def _sigmas(self, num_steps: int) -> np.ndarray:
        return flow_sigmas(num_steps, shift=self.shift,
                           num_train_timesteps=self.config.num_train_timesteps)

    def timesteps(self, num_steps: int) -> np.ndarray:
        """Flow conditioning timesteps: sigma * T, descending floats (the
        sigma grid without its trailing 0).  Overrides the VP
        ``space_timesteps`` grid — flow schedules are defined in sigma, and
        the composers (plans.py) pass these through ``t / T`` to recover
        sigmas exactly."""
        T = self.config.num_train_timesteps
        return self._sigmas(num_steps)[:-1] * T

    # ---- composer hooks (flow<->flow composition; see class docstring) ----
    def _rows_on_grid(self, sigmas, indices, tag=""):
        from sonicdiffusionbayeslab_tpu.schedulers.flow import flow_transition_row

        sig = np.asarray(sigmas, np.float64)
        return [
            flow_transition_row(
                float(sig[i]), float(sig[i + 1]),
                num_train_timesteps=self.config.num_train_timesteps, tag=tag,
            )
            for i in indices
        ]

    @staticmethod
    def _grid_from_ts(ts, T) -> np.ndarray:
        """sigma grid (trailing 0.0) from a composer's timestep array."""
        return np.concatenate([np.asarray(ts, np.float64) / T, [0.0]])

    def transition_rows(self, ts, num_steps, executed, tag=""):
        sig = self._grid_from_ts(ts, self.config.num_train_timesteps)
        return self._rows_on_grid(sig, list(executed), tag=tag)

    def transition_rows_from_schedule(self, ts, start, tag=""):
        sig = self._grid_from_ts(ts, self.config.num_train_timesteps)
        return self._rows_on_grid(sig, range(start, len(ts)), tag=tag)

    def ladder_rows(self, ts_exec, positions, tag=""):
        # Interleave "ladder" semantics: executed steps transition along the
        # executed schedule's true noise levels (plans.interleave_plan).
        sig = self._grid_from_ts(ts_exec, self.config.num_train_timesteps)
        return self._rows_on_grid(sig, list(positions), tag=tag)

    def skip_rows(self, num_steps, executed, tag=""):
        # Flow Euler is timestep-indexed (memoryless), so skip keeps each
        # executed step's own sigma[i] -> sigma[i+1] target and un-executed
        # transitions are simply absent — the run ends short of sigma=0 by
        # the skipped steps' integrated delta, the same semantics as DDIM
        # skips (reference src/models.py:1337-1340).
        return self._rows_on_grid(self._sigmas(num_steps), list(executed), tag=tag)

    def build_plan(self, num_steps: int) -> SamplePlan:
        return self.tail_plan(num_steps, 0)

    def tail_plan(self, num_steps: int, start_index: int) -> SamplePlan:
        sig = self._sigmas(num_steps)
        rows = flow_euler_rows(
            sig[start_index:],
            num_train_timesteps=self.config.num_train_timesteps,
        )
        sfx = f"[{start_index}:]" if start_index else ""
        return stack_rows(
            rows, name=f"{self.NAME}(n={num_steps},shift={self.shift:g}){sfx}",
        )

    def noised_latents(self, z, noise, num_steps: int, start_index: int):
        """Flow-path seeding (img2img): x = (1-sigma) z + sigma noise."""
        s = float(self._sigmas(num_steps)[start_index])
        return (1.0 - s) * z + s * noise

    def blend_schedule(self, num_steps: int, start_index: int = 0):
        s = np.asarray(self._sigmas(num_steps)[start_index + 1:], np.float32)
        return (1.0 - s), s


@schedulers_registry.add_to_registry("pndm_scheduler")
class PNDMScheduler(_PlanBuilder):
    NAME = "pndm"

    def __init__(self, schedule_config=None, prediction_type=None):
        super().__init__(schedule_config, prediction_type)

    def build_plan(self, num_steps: int) -> SamplePlan:
        rows = pndm_rows(
            self.schedule, num_steps, prediction_type=self.config.prediction_type
        )
        return stack_rows(rows, name=f"pndm(n={num_steps})", hist_depth=4)

    def tail_plan(self, num_steps: int, start_index: int) -> SamplePlan:
        if start_index:
            raise NotImplementedError(
                "img2img tails are not defined for PLMS's duplicated warm-up step"
            )
        return self.build_plan(num_steps)

    def blend_schedule(self, num_steps: int, start_index: int = 0):
        raise NotImplementedError(
            "inpainting blend is not defined for PLMS's duplicated warm-up step"
        )
