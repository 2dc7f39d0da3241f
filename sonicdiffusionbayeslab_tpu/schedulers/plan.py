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

    eps   = model(in_scale * x, timestep)      # input scaling (sigma-space
                                               # samplers; 1.0 for VP)
    m     = cm_sample * x + cm_eps * eps       # "converted model output"
    x0    = cx_sample * x + cx_eps * eps       # x0 prediction (introspection)
    hist  = push ? shift_in(hist, m) : hist    # multistep history ring
    x'    = w_sample * x + w_saved * saved + w_eps * eps
            + sum_k w_hist[k] * hist[k] + w_noise * noise
    saved = s_x * x + s_saved * saved + sum_k s_hist[k] * hist[k]

History convention: ``hist[0]`` is the most recent pushed entry.  The saved
buffer is itself a linear combination per step, which is what lets
predictor-corrector methods (UniPC) fuse their two chained linear updates
into one row; the Boolean convenience flags ``use_saved`` / ``save_cur``
(PNDM/PLMS semantics) are translated into these weights at stack time.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class StepRow:
    """One denoising step's coefficients (host-side, float64)."""

    timestep: float  # UNet conditioning timestep (float for interpolated grids)
    in_scale: float = 1.0  # model-input scale (scale_model_input; 1.0 for VP)
    w_sample: float = 0.0
    w_eps: float = 0.0
    w_hist: tuple = ()  # per-slot weights, slot 0 = most recent
    w_noise: float = 0.0
    cm_sample: float = 0.0
    cm_eps: float = 1.0
    cx_sample: float = 0.0
    cx_eps: float = 1.0
    push: bool = True
    use_saved: bool = False  # convenience: x' base = saved instead of x
    save_cur: bool = False  # convenience: saved' = x
    # General saved-buffer weights (override the Boolean flags when set):
    w_saved: Optional[float] = None  # saved's weight in x'
    s_x: Optional[float] = None  # saved' = s_x*x + s_saved*saved + s_hist.hist
    s_saved: Optional[float] = None
    s_hist: tuple = ()
    scheduler: str = ""  # provenance label (debug/tests only)
    tag: str = ""  # provenance label (e.g. "phase1", "inter")

    def resolved_saved_weights(self):
        """(wx, w_saved, s_x, s_saved, s_hist): the general form of this
        row's saved-buffer interaction, translating the Boolean flags."""
        explicit = any(v is not None for v in (self.w_saved, self.s_x, self.s_saved)) or self.s_hist
        if explicit:
            if self.use_saved or self.save_cur:
                raise ValueError("mix of Boolean saved flags and explicit saved weights")
            return (
                self.w_sample,
                self.w_saved or 0.0,
                self.s_x or 0.0,
                1.0 if self.s_saved is None else self.s_saved,
                tuple(self.s_hist),
            )
        if self.use_saved:
            wx, wsv = 0.0, self.w_sample
        else:
            wx, wsv = self.w_sample, 0.0
        if self.save_cur:
            sx, ssv = 1.0, 0.0
        else:
            sx, ssv = 0.0, 1.0
        return wx, wsv, sx, ssv, ()


@dataclasses.dataclass(frozen=True)
class SamplePlan:
    """Stacked per-step arrays; the single input to the jitted sampler.

    All float arrays are float32 (converted from float64 rows), shape [L]
    except ``w_hist`` [L, H].  Static metadata (hist_depth, needs_noise,
    has_saved) shapes the scan carry at trace time.
    """

    name: str
    timesteps: np.ndarray  # float32 [L] (integral for VP grids)
    in_scale: np.ndarray  # float32 [L] model-input scale
    init_scale: float  # initial-latent scale (init_noise_sigma; 1.0 for VP)
    w_sample: np.ndarray
    w_eps: np.ndarray
    w_hist: np.ndarray  # [L, H]
    w_noise: np.ndarray
    cm_sample: np.ndarray
    cm_eps: np.ndarray
    cx_sample: np.ndarray
    cx_eps: np.ndarray
    push: np.ndarray  # float32 0/1
    w_saved: np.ndarray  # saved's weight in x'
    s_x: np.ndarray  # saved' update weights
    s_saved: np.ndarray
    s_hist: np.ndarray  # [L, H]
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
        return bool(
            np.any(self.w_saved != 0.0)
            or np.any(self.s_x != 0.0)
            or np.any(self.s_hist != 0.0)
        )

    def tail(self, start_index: int) -> "SamplePlan":
        """Sub-plan executing rows[start_index:] — the img2img entry point.

        ``init_scale`` resets to 1.0: the caller seeds the run with latents
        already noised to the start row's level in the plan's native space
        (VP: a_t z + s_t eps; sigma-space: z + sigma eps — see the
        schedulers' ``noised_latents``)."""
        if not self.rows:
            raise ValueError("plan has no retained rows to slice")
        if not 0 <= start_index < len(self.rows):
            raise ValueError(f"start_index {start_index} out of range [0, {len(self.rows)})")
        return stack_rows(
            list(self.rows[start_index:]),
            name=f"{self.name}[{start_index}:]",
            hist_depth=self.hist_depth,
            init_scale=1.0,
        )

    def scan_xs(self) -> Dict[str, np.ndarray]:
        """Per-step arrays fed as the xs of ``jax.lax.scan``."""
        return {
            "timestep": self.timesteps,
            "in_scale": self.in_scale,
            "w_sample": self.w_sample,
            "w_eps": self.w_eps,
            "w_hist": self.w_hist,
            "w_noise": self.w_noise,
            "cm_sample": self.cm_sample,
            "cm_eps": self.cm_eps,
            "cx_sample": self.cx_sample,
            "cx_eps": self.cx_eps,
            "push": self.push,
            "w_saved": self.w_saved,
            "s_x": self.s_x,
            "s_saved": self.s_saved,
            "s_hist": self.s_hist,
        }


def stack_rows(
    rows: List[StepRow], name: str, hist_depth: Optional[int] = None,
    init_scale: float = 1.0,
) -> SamplePlan:
    if not rows:
        raise ValueError("empty plan")
    depth = hist_depth if hist_depth is not None else max(
        (max(len(r.w_hist), len(r.s_hist)) for r in rows), default=0
    )
    depth = max(depth, 1)
    L = len(rows)
    w_hist = np.zeros((L, depth), dtype=np.float32)
    s_hist = np.zeros((L, depth), dtype=np.float32)
    saved_w = np.zeros((L, 4), dtype=np.float32)  # wx, w_saved, s_x, s_saved
    for i, r in enumerate(rows):
        if max(len(r.w_hist), len(r.s_hist)) > depth:
            raise ValueError(f"row {i} uses more hist slots than depth {depth}")
        w_hist[i, : len(r.w_hist)] = np.asarray(r.w_hist, dtype=np.float32)
        wx, wsv, sx, ssv, sh = r.resolved_saved_weights()
        saved_w[i] = (wx, wsv, sx, ssv)
        s_hist[i, : len(sh)] = np.asarray(sh, dtype=np.float32)

    def f(field):
        return np.asarray([getattr(r, field) for r in rows], dtype=np.float32)

    return SamplePlan(
        name=name,
        timesteps=np.asarray([r.timestep for r in rows], dtype=np.float32),
        in_scale=f("in_scale"),
        init_scale=float(init_scale),
        w_sample=saved_w[:, 0],
        w_eps=f("w_eps"),
        w_hist=w_hist,
        w_noise=f("w_noise"),
        cm_sample=f("cm_sample"),
        cm_eps=f("cm_eps"),
        cx_sample=f("cx_sample"),
        cx_eps=f("cx_eps"),
        push=f("push"),
        w_saved=saved_w[:, 1],
        s_x=saved_w[:, 2],
        s_saved=saved_w[:, 3],
        s_hist=s_hist,
        rows=tuple(rows),
    )


def reference_apply(plan: SamplePlan, sample: np.ndarray, eps_fn, noise_fn=None, collect_x0=False):
    """Float64 numpy oracle of the runtime scan — the test-time ground truth
    the jitted TPU path is checked against (SURVEY §4 parity gates).

    ``eps_fn(step_index, timestep, sample) -> model_output``.
    """
    x = np.asarray(sample, dtype=np.float64) * plan.init_scale
    hist = [np.zeros_like(x) for _ in range(plan.hist_depth)]
    saved = np.zeros_like(x)
    x0s = []
    for i, r in enumerate(plan.rows):
        eps = np.asarray(eps_fn(i, r.timestep, x * r.in_scale), dtype=np.float64)
        m = r.cm_sample * x + r.cm_eps * eps
        x0 = r.cx_sample * x + r.cx_eps * eps
        if r.push:
            hist = [m] + hist[:-1]
        wx, wsv, sx, ssv, sh = r.resolved_saved_weights()
        new = wx * x + wsv * saved + r.w_eps * eps
        for k, w in enumerate(r.w_hist):
            new = new + w * hist[k]
        if r.w_noise:
            if noise_fn is None:
                raise ValueError("plan needs noise but no noise_fn given")
            new = new + r.w_noise * np.asarray(noise_fn(i, x.shape), dtype=np.float64)
        new_saved = sx * x + ssv * saved
        for k, w in enumerate(sh):
            new_saved = new_saved + w * hist[k]
        saved = new_saved
        x = new
        if collect_x0:
            x0s.append(x0)
    return (x, x0s) if collect_x0 else x
