"""SamplePlan: the universal per-step coefficient representation.

Core design of the TPU rebuild (replaces the reference's mutable scheduler
objects + in-loop Python dispatch, ``src/schedulers.py:98-187`` and the four
``src/models.py`` pipeline loops): every supported scheduler update —
DDIM, DPM-Solver(++) orders 1-3 (incl. SDE), LCM, PNDM/PLMS — is *linear*
in (sample, model_output, history entries, fresh noise).  A sampling run is
therefore fully described by per-step scalar coefficient rows, computed in
float64 numpy at plan time.  On device, one ``jax.lax.scan`` consumes the
stacked rows; the whole scheduler zoo is a handful of fused AXPYs after the
UNet call.  Scheduler switching / interleaving / step-skipping compose plans
(pure integer/float math, exhaustively unit-testable) instead of branching
in the hot loop.

Per-step update applied by the runtime (all in fp32):

    m    = cm_sample * x + cm_eps * eps        # "converted model output"
    x0   = cx_sample * x + cx_eps * eps        # x0 prediction (introspection)
    hist = push ? shift_in(hist, m) : hist     # multistep history ring
    base = use_saved ? saved : x
    x'   = w_sample * base + w_eps * eps + sum_k w_hist[k] * hist[k]
           + w_noise * noise
    saved = save_cur ? x : saved

History convention: ``hist[0]`` is the most recent pushed entry.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class StepRow:
    """One denoising step's coefficients (host-side, float64)."""

    timestep: int  # UNet conditioning timestep
    w_sample: float = 0.0
    w_eps: float = 0.0
    w_hist: tuple = ()  # per-slot weights, slot 0 = most recent
    w_noise: float = 0.0
    cm_sample: float = 0.0
    cm_eps: float = 1.0
    cx_sample: float = 0.0
    cx_eps: float = 1.0
    push: bool = True
    use_saved: bool = False
    save_cur: bool = False
    scheduler: str = ""  # provenance label (debug/tests only)
    tag: str = ""  # provenance label (e.g. "phase1", "inter")


@dataclasses.dataclass(frozen=True)
class SamplePlan:
    """Stacked per-step arrays; the single input to the jitted sampler.

    All float arrays are float32 (converted from float64 rows), shape [L]
    except ``w_hist`` [L, H].  Static metadata (hist_depth, needs_noise,
    has_saved) shapes the scan carry at trace time.
    """

    name: str
    timesteps: np.ndarray  # int32 [L]
    w_sample: np.ndarray
    w_eps: np.ndarray
    w_hist: np.ndarray  # [L, H]
    w_noise: np.ndarray
    cm_sample: np.ndarray
    cm_eps: np.ndarray
    cx_sample: np.ndarray
    cx_eps: np.ndarray
    push: np.ndarray  # float32 0/1
    use_saved: np.ndarray
    save_cur: np.ndarray
    rows: tuple = dataclasses.field(default=(), repr=False, compare=False)

    # -- static facts -------------------------------------------------------
    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @property
    def nfe(self) -> int:
        """UNet evaluations (reference NFE metric: one per executed step)."""
        return self.num_steps

    @property
    def hist_depth(self) -> int:
        return int(self.w_hist.shape[1])

    @property
    def needs_noise(self) -> bool:
        return bool(np.any(self.w_noise != 0.0))

    @property
    def has_saved(self) -> bool:
        return bool(np.any(self.use_saved != 0.0) or np.any(self.save_cur != 0.0))

    def scan_xs(self) -> Dict[str, np.ndarray]:
        """Per-step arrays fed as the xs of ``jax.lax.scan``."""
        return {
            "timestep": self.timesteps,
            "w_sample": self.w_sample,
            "w_eps": self.w_eps,
            "w_hist": self.w_hist,
            "w_noise": self.w_noise,
            "cm_sample": self.cm_sample,
            "cm_eps": self.cm_eps,
            "cx_sample": self.cx_sample,
            "cx_eps": self.cx_eps,
            "push": self.push,
            "use_saved": self.use_saved,
            "save_cur": self.save_cur,
        }


def stack_rows(rows: List[StepRow], name: str, hist_depth: Optional[int] = None) -> SamplePlan:
    if not rows:
        raise ValueError("empty plan")
    depth = hist_depth if hist_depth is not None else max((len(r.w_hist) for r in rows), default=0)
    depth = max(depth, 1)
    L = len(rows)
    w_hist = np.zeros((L, depth), dtype=np.float32)
    for i, r in enumerate(rows):
        if len(r.w_hist) > depth:
            raise ValueError(f"row {i} uses {len(r.w_hist)} hist slots > depth {depth}")
        w_hist[i, : len(r.w_hist)] = np.asarray(r.w_hist, dtype=np.float32)

    def f(field):
        return np.asarray([getattr(r, field) for r in rows], dtype=np.float32)

    return SamplePlan(
        name=name,
        timesteps=np.asarray([r.timestep for r in rows], dtype=np.int32),
        w_sample=f("w_sample"),
        w_eps=f("w_eps"),
        w_hist=w_hist,
        w_noise=f("w_noise"),
        cm_sample=f("cm_sample"),
        cm_eps=f("cm_eps"),
        cx_sample=f("cx_sample"),
        cx_eps=f("cx_eps"),
        push=f("push"),
        use_saved=f("use_saved"),
        save_cur=f("save_cur"),
        rows=tuple(rows),
    )


def reference_apply(plan: SamplePlan, sample: np.ndarray, eps_fn, noise_fn=None, collect_x0=False):
    """Float64 numpy oracle of the runtime scan — the test-time ground truth
    the jitted TPU path is checked against (SURVEY §4 parity gates).

    ``eps_fn(step_index, timestep, sample) -> model_output``.
    """
    x = np.asarray(sample, dtype=np.float64)
    hist = [np.zeros_like(x) for _ in range(plan.hist_depth)]
    saved = np.zeros_like(x)
    x0s = []
    for i, r in enumerate(plan.rows):
        eps = np.asarray(eps_fn(i, r.timestep, x), dtype=np.float64)
        m = r.cm_sample * x + r.cm_eps * eps
        x0 = r.cx_sample * x + r.cx_eps * eps
        if r.push:
            hist = [m] + hist[:-1]
        base = saved if r.use_saved else x
        new = r.w_sample * base + r.w_eps * eps
        for k, w in enumerate(r.w_hist):
            new = new + w * hist[k]
        if r.w_noise:
            if noise_fn is None:
                raise ValueError("plan needs noise but no noise_fn given")
            new = new + r.w_noise * np.asarray(noise_fn(i, x.shape), dtype=np.float64)
        if r.save_cur:
            saved = x
        x = new
        if collect_x0:
            x0s.append(x0)
    return (x, x0s) if collect_x0 else x
