"""The eight experiment methods (methods registry, parity names with
reference src/experiments/: default, ddim, dpm_solver, deep_cache,
consistency_model, two_schedulers, interliving_schedulers, skip_steps).

Each method = a scheduler assignment + a grid definition; generation and
validation live in BaseMethod.  Grid labels mirror the reference's sweep
axes (SURVEY §6 table).
"""

from __future__ import annotations

from typing import Iterable

from sonicdiffusionbayeslab_tpu.experiments.base import BaseMethod
from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan
from sonicdiffusionbayeslab_tpu.registry import methods_registry


def _sweep(v) -> list:
    """Sweep axes accept a YAML list ([10, 20]) or a bare scalar (20) —
    the reference requires lists and crashes on scalars; a single-point
    sweep is a legitimate config."""
    return list(v) if isinstance(v, (list, tuple)) else [v]


_MULTISTEP_SCHEDULERS = ("dpm_solver_scheduler", "deis_scheduler", "unipc_scheduler")


def _composer_scheduler_kwargs(name: str, params) -> dict:
    """Per-scheduler kwargs for the composition methods (two_schedulers /
    interliving / skip_steps), which build schedulers by registry name:
    multistep families take the sweep's solver_order (the kwarg the
    reference misspells and silently drops, two_schedulers.py:51,59); the
    flow family takes the sigma-grid shift (SD3-class plans)."""
    if name in _MULTISTEP_SCHEDULERS:
        return {"solver_order": int(params.get("solver_order", 2))}
    if name == "flow_match_euler_scheduler":
        return {"shift": float(params.get("shift", 3.0))}
    return {}


@methods_registry.add_to_registry("default")
class DefaultStableDiffusion(BaseMethod):
    """Baseline sweep with SD's default PNDM/PLMS scheduler (reference
    default_sd.py:10-100, which leaves the pipeline scheduler untouched)."""

    def setup_scheduler(self) -> None:
        self.model.scheduler = self.build_scheduler("pndm_scheduler")

    def grid(self) -> Iterable[dict]:
        for steps in _sweep(self.params.get("num_inference_steps", [50])):
            yield {
                "label": f"steps_{steps}",
                "call_kw": {"num_inference_steps": int(steps), "use_x0": True},
            }


@methods_registry.add_to_registry("ddim")
class DDIMMethod(BaseMethod):
    """DDIM step sweep with optional x0-grid capture (reference ddim.py:11-57)."""

    def grid(self) -> Iterable[dict]:
        use_x0 = bool(self.params.get("use_x0", False))
        for steps in _sweep(self.params.get("num_inference_steps", [50])):
            yield {
                "label": f"steps_{steps}",
                "call_kw": {"num_inference_steps": int(steps), "use_x0": use_x0},
            }


@methods_registry.add_to_registry("dpm_solver")
class DPMSolverMethod(BaseMethod):
    """DPM-Solver++ sweep (reference dpm_solver.py:9-69).  Scheduler kwargs
    come from experiment_params with reference defaults — and unlike the
    reference (whose config lacks keys its code reads unconditionally,
    SURVEY §5), missing keys get defaults instead of crashing."""

    def setup_scheduler(self) -> None:
        self.model.scheduler = self.build_scheduler(
            self.config.scheduler.get("scheduler_name", "dpm_solver_scheduler"),
            solver_order=int(self.params.get("solver_order", 2)),
            algorithm_type=self.params.get("algorithm_type", "dpmsolver++"),
            final_sigmas_type=self.params.get("final_sigmas_type", "zero"),
            use_karras_sigmas=bool(self.params.get("use_karras_sigmas", False)),
        )

    def grid(self) -> Iterable[dict]:
        for steps in _sweep(self.params.get("num_inference_steps", [20])):
            yield {
                "label": f"steps_{steps}",
                "call_kw": {"num_inference_steps": int(steps), "use_x0": True},
            }


@methods_registry.add_to_registry("unipc")
class UniPCMethod(BaseMethod):
    """UniPC step sweep (beyond-reference scheduler; schedulers/unipc.py).
    Same sweep shape as dpm_solver so the two are directly comparable."""

    def setup_scheduler(self) -> None:
        self.model.scheduler = self.build_scheduler(
            self.config.scheduler.get("scheduler_name", "unipc_scheduler"),
            solver_order=int(self.params.get("solver_order", 2)),
            variant=self.params.get("variant", "bh2"),
            use_corrector=bool(self.params.get("use_corrector", True)),
            use_karras_sigmas=bool(self.params.get("use_karras_sigmas", False)),
        )

    def grid(self) -> Iterable[dict]:
        for steps in _sweep(self.params.get("num_inference_steps", [20])):
            yield {
                "label": f"steps_{steps}",
                "call_kw": {"num_inference_steps": int(steps), "use_x0": True},
            }


@methods_registry.add_to_registry("flow_euler")
class FlowEulerMethod(BaseMethod):
    """Rectified-flow Euler step sweep (beyond-reference; SD3-class
    flow-matching families, schedulers/flow.py).  Same sweep shape as
    dpm_solver so NFE/quality columns are directly comparable.  ``shift``
    is the resolution shift of the sigma grid (3.0 = SD3-medium)."""

    def setup_scheduler(self) -> None:
        self.model.scheduler = self.build_scheduler(
            self.config.scheduler.get("scheduler_name", "flow_match_euler_scheduler"),
            shift=float(self.params.get("shift", 3.0)),
        )

    def grid(self) -> Iterable[dict]:
        for steps in _sweep(self.params.get("num_inference_steps", [28])):
            yield {
                "label": f"steps_{steps}",
                "call_kw": {"num_inference_steps": int(steps), "use_x0": True},
            }


@methods_registry.add_to_registry("deis")
class DEISMethod(BaseMethod):
    """DEIS-logrho step sweep (beyond-reference sampler; schedulers/deis.py).
    Same sweep shape as dpm_solver/unipc so the three are comparable."""

    def setup_scheduler(self) -> None:
        self.model.scheduler = self.build_scheduler(
            self.config.scheduler.get("scheduler_name", "deis_scheduler"),
            solver_order=int(self.params.get("solver_order", 2)),
            final_sigmas_type=self.params.get("final_sigmas_type", "zero"),
            use_karras_sigmas=bool(self.params.get("use_karras_sigmas", False)),
        )

    def grid(self) -> Iterable[dict]:
        for steps in _sweep(self.params.get("num_inference_steps", [20])):
            yield {
                "label": f"steps_{steps}",
                "call_kw": {"num_inference_steps": int(steps), "use_x0": True},
            }


@methods_registry.add_to_registry("deep_cache")
class DeepCacheMethod(BaseMethod):
    """DeepCache sweep: (cache_interval x steps) grid (reference
    deep_cache.py:10-58).  Instead of monkey-patched forward hooks, the
    cache schedule is a static CachePlan consumed by the compiled sampler."""

    def grid(self) -> Iterable[dict]:
        intervals = _sweep(self.params.get("cache_interval", [2]))
        branch = int(self.params.get("cache_branch_id", 0))
        # Optional Token Merging modifier: DeepCache x ToMe compose (both
        # approximate, same product family; measured 20.3k img/h with int8
        # quant on top — docs/PERF.md max-stack table).
        tome = self.params.get("tome_ratio")
        extra = {"tome_ratio": float(tome)} if tome is not None else {}
        for interval in intervals:
            for steps in _sweep(self.params.get("num_inference_steps", [50])):
                yield {
                    "label": f"interval_{interval}_steps_{steps}",
                    "call_kw": {"num_inference_steps": int(steps), **extra},
                    "pre": lambda interval=interval: self._enable(int(interval), branch),
                }

    def _enable(self, interval: int, branch: int = 0) -> None:
        self.model.cache_plan_fn = lambda n: CachePlan.every(n, interval, branch)

    def run_experiment(self):
        # Wrap BaseMethod's sweep to toggle the cache hook per grid point
        # (reference enables/disables the DeepCacheSDHelper the same way).
        orig_grid = self.grid

        def grid_with_hooks():
            for point in orig_grid():
                pre = point.pop("pre", None)
                if pre:
                    pre()
                yield point

        self.grid = grid_with_hooks  # type: ignore[assignment]
        try:
            return super().run_experiment()
        finally:
            self.grid = orig_grid  # type: ignore[assignment]
            self.model.cache_plan_fn = None


@methods_registry.add_to_registry("consistency_model")
class ConsistencyModelMethod(BaseMethod):
    """LCM sweep at guidance 0 (reference consistency_model.py:9-52:
    LCM-LoRA fused into the UNet + LCMScheduler, steps 1-50)."""

    def setup_model(self) -> None:
        super().setup_model()
        lora = self.config.model.get("lora", "latent-consistency/lcm-lora-sdv1-5")
        self.model.load_lora_weights(lora)
        self.model.fuse_lora()

    def setup_scheduler(self) -> None:
        self.model.scheduler = self.build_scheduler(
            self.config.scheduler.get("scheduler_name", "lcm_scheduler")
        )

    def grid(self) -> Iterable[dict]:
        guidance = float(self.params.get("guidance_scale", 0.0))
        for steps in _sweep(self.params.get("num_inference_steps", [4])):
            yield {
                "label": f"steps_{steps}",
                "call_kw": {"num_inference_steps": int(steps), "guidance_scale": guidance},
            }


class _TwoSchedulerBase(BaseMethod):
    def _build_pair(self, key1: str, key2: str, default1: str, default2: str):
        scfg = self.config.get("scheduler")

        def build(name):
            # NB: the reference passes a misspelled 'sovler_order' kwarg
            # that diffusers silently drops (two_schedulers.py:51,59) —
            # here solver_order is applied for real, and our registry
            # would reject the typo loudly.
            return self.build_scheduler(
                name, **_composer_scheduler_kwargs(name, self.params)
            )

        return (
            build(scfg.get(key1, default1) if scfg else default1),
            build(scfg.get(key2, default2) if scfg else default2),
        )


@methods_registry.add_to_registry("two_schedulers")
class TwoSchedulerMethod(_TwoSchedulerBase):
    """Scheduler-switch sweep over zipped (steps_first, steps_second,
    num_step_switch) triples (reference two_schedulers.py:10-173)."""

    def setup_scheduler(self) -> None:
        first, second = self._build_pair(
            "scheduler_first", "scheduler_second", "ddim_scheduler", "dpm_solver_scheduler"
        )
        self.model.scheduler_first = first
        self.model.scheduler_second = second

    def grid(self) -> Iterable[dict]:
        firsts = _sweep(self.params.get("num_inference_steps_first", [10]))
        seconds = _sweep(self.params.get("num_inference_steps_second", firsts))
        switches = _sweep(self.params.get("num_step_switch", [1]))
        type_switch = self.params.get("type_switch", "closest")
        for n1, n2, k in zip(firsts, seconds, switches):
            yield {
                "label": f"first_{n1}_second_{n2}_switch_{k}",
                "call_kw": {
                    "num_inference_steps": int(n1),
                    "num_inference_steps_second": int(n2),
                    "num_step_switch": int(k),
                    "type_switch": type_switch,
                },
            }


@methods_registry.add_to_registry("interliving_schedulers")
class InterlivingSchedulerMethod(_TwoSchedulerBase):
    """Interleaved-scheduler sweep over zipped (num_steps, interliving_steps)
    lists (reference interliving_exp.py:10-171)."""

    def setup_scheduler(self) -> None:
        main, inter = self._build_pair(
            "scheduler_main", "scheduler_inter", "dpm_solver_scheduler", "dpm_solver_scheduler"
        )
        self.model.scheduler_main = main
        self.model.scheduler_inter = inter

    def grid(self) -> Iterable[dict]:
        steps_list = _sweep(self.params.get("num_inference_steps", [20]))
        inter_lists = self.params.get("interliving_steps", [[0]])
        mode = self.params.get("interleave_mode", "ladder")
        for steps, inters in zip(steps_list, inter_lists):
            yield {
                "label": f"steps_{steps}_inter_{'-'.join(map(str, inters))}",
                "call_kw": {
                    "num_inference_steps": int(steps),
                    "interliving_steps": [int(i) for i in inters],
                    "interleave_mode": mode,
                },
            }


@methods_registry.add_to_registry("skip_steps")
class SkipStepsMethod(BaseMethod):
    """Step-skipping sweep over zipped (num_inference_steps, skip_steps)
    lists (reference skip_steps_exp.py:10-135, DPM-Solver kwargs)."""

    def setup_scheduler(self) -> None:
        name = (
            self.config.scheduler.get("scheduler_name", "dpm_solver_scheduler")
            if self.config.get("scheduler")
            else "dpm_solver_scheduler"
        )
        self.model.scheduler = self.build_scheduler(
            name, **_composer_scheduler_kwargs(name, self.params)
        )

    def grid(self) -> Iterable[dict]:
        steps_list = _sweep(self.params.get("num_inference_steps", [20]))
        skip_lists = self.params.get("skip_steps", [[]])
        for steps, skips in zip(steps_list, skip_lists):
            yield {
                "label": f"steps_{steps}_skip_{'-'.join(map(str, skips)) or 'none'}",
                "call_kw": {
                    "num_inference_steps": int(steps),
                    "skip_timesteps": [int(s) for s in skips],
                    "use_x0": True,
                },
            }


@methods_registry.add_to_registry("tome")
class TomeMethod(BaseMethod):
    """Token Merging sweep (Bolya & Hoffman, ToMeSD 2023) — beyond-reference
    acceleration method in DeepCache's product family (approximate, big
    attention cut; ops/tome.py).  Grid: tome_ratio x num_inference_steps,
    scheduler configurable like dpm_solver (defaults to DPM-Solver++)."""

    def setup_scheduler(self) -> None:
        self.model.scheduler = self.build_scheduler(
            self.config.scheduler.get("scheduler_name", "dpm_solver_scheduler")
            if self.config.get("scheduler")
            else "dpm_solver_scheduler",
            solver_order=int(self.params.get("solver_order", 2)),
        )

    def grid(self) -> Iterable[dict]:
        ratios = _sweep(self.params.get("tome_ratio", [0.5]))
        for ratio in ratios:
            for steps in _sweep(self.params.get("num_inference_steps", [20])):
                yield {
                    "label": f"ratio_{ratio}_steps_{steps}",
                    "call_kw": {
                        "num_inference_steps": int(steps),
                        "tome_ratio": float(ratio),
                        "use_x0": True,
                    },
                }
