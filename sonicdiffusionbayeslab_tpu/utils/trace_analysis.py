"""Per-op breakdown of a ``jax.profiler`` trace (docs/PERF.md workflow).

The reference's only instrumentation is wall clock around the denoise loop
(src/models.py:208,284-285).  On TPU the equivalent *diagnostic* story is a
device trace: ``utils.profiling.trace`` captures one, and this module turns
it into the table that aims perf work — per-op self time, HLO category,
achieved FLOP/s and bytes/s, grouped over a whole ``lax.scan`` loop.

Usage::

    with profiling.trace("outputs/profile/run"):
        engine.sample(...)
    python -m sonicdiffusionbayeslab_tpu.utils.trace_analysis outputs/profile/run

The aggregation keys on self time (a parent fusion's time minus its nested
children) inside the longest XLA module window (the jitted loop), so numbers
sum to the loop's device time exactly.
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
import re
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

# v5e bf16 peak; used only for the MFU column of the report.
PEAK_FLOPS = float(197e12)


@dataclasses.dataclass
class OpRow:
    name: str
    category: str
    self_ms: float
    count: int
    flops: float  # per call (XLA model_flops)
    bytes_accessed: float  # per call
    long_name: str

    @property
    def tflops(self) -> float:
        if self.self_ms <= 0 or not self.flops:
            return 0.0
        return self.flops * self.count / (self.self_ms / 1e3) / 1e12

    @property
    def gbps(self) -> float:
        if self.self_ms <= 0 or not self.bytes_accessed:
            return 0.0
        return self.bytes_accessed * self.count / (self.self_ms / 1e3) / 1e9


def _latest_trace_file(log_dir: str | Path) -> Path:
    files = sorted(glob.glob(str(Path(log_dir) / "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    return Path(files[-1])


def _classify(name: str, long_name: str, category: str) -> str:
    """Map an HLO op to a human bucket.  Heuristics keyed on the shapes in
    the fusion's signature — attention score/value matmuls are the fusions
    consuming [B,N,H,D]-shaped bitcast triples; GroupNorm stats are the
    convert+reduce fusions emitting f32 channel moments."""
    ln = long_name or ""
    if re.match(r"(convert_)?reduce", name) or "reduce_fusion" in name:
        return "norm-stats (GroupNorm/Softmax reductions)"
    m = re.search(r"bf16\[(\d+),(\d+),(\d+),(\d+)\][^)]*bitcast", ln)
    if name.startswith("fusion") and ln.count("bitcast") >= 2:
        m2 = re.search(r"fusion\(bf16\[(\d+),(\d+),(\d+),(\d+)\]", ln)
        if m2:
            b, n, h, d = map(int, m2.groups())
            if d <= 256 and n >= 64:  # [B, N, H, D] q/k/v triple
                return f"attention N={n} D={d}"
    if category and "convolution" in category:
        m3 = re.search(r"= bf16\[(\d+),(\d+),(\d+),(\d+)\]", ln)
        if m3:
            b, h, w, c = map(int, m3.groups())
            if h == w and h in (8, 16, 32, 64, 128):
                return f"conv/matmul {h}x{w}"
        return "conv/matmul other"
    if name.startswith(("copy", "bitcast", "reshape", "transpose")):
        return "layout/copy"
    if "loop" in name or "while" in name:
        return "loop overhead"
    if name.startswith(("dynamic_slice", "dynamic-update")):
        return "plan indexing"
    return "other"


def analyze(log_dir: str | Path, module_hint: str = "") -> Tuple[List[OpRow], float]:
    """Returns (per-op rows sorted by self time desc, module_ms)."""
    path = _latest_trace_file(log_dir)
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = [p for p, n in pids.items() if "TPU" in n]
    if not tpu_pids:
        raise RuntimeError(f"no TPU process in {path}")
    tpu = tpu_pids[0]
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ops_tids = {t for (p, t), n in tids.items() if p == tpu and n == "XLA Ops"}
    mod_tids = {t for (p, t), n in tids.items() if p == tpu and n == "XLA Modules"}

    mods = [e for e in events
            if e.get("pid") == tpu and e.get("ph") == "X" and e.get("tid") in mod_tids
            and (module_hint in e.get("name", ""))]
    if not mods:
        raise RuntimeError(f"no XLA module matching {module_hint!r}")
    win = max(mods, key=lambda e: e["dur"])  # the jitted loop dominates
    w0, w1 = win["ts"], win["ts"] + win["dur"]

    ops = [e for e in events
           if e.get("pid") == tpu and e.get("ph") == "X" and e.get("tid") in ops_tids
           and e["ts"] >= w0 and e["ts"] + e["dur"] <= w1]
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))

    # Self time: subtract each event's duration from its innermost parent.
    self_us: Dict[str, float] = collections.Counter()
    count: Dict[str, int] = collections.Counter()
    meta: Dict[str, dict] = {}
    stack: List[Tuple[float, float, str]] = []
    for e in ops:
        while stack and e["ts"] >= stack[-1][1]:
            stack.pop()
        if stack:
            self_us[stack[-1][2]] -= e["dur"]
        name = e["name"]
        stack.append((e["ts"], e["ts"] + e["dur"], name))
        self_us[name] += e["dur"]
        count[name] += 1
        if name not in meta:
            meta[name] = e.get("args", {}) or {}

    rows = []
    for name, us in self_us.items():
        a = meta.get(name, {})
        n = max(1, count[name])
        rows.append(OpRow(
            name=name,
            category=_classify(name, a.get("long_name", ""), a.get("hlo_category", "")),
            self_ms=us / 1e3,
            count=count[name],
            flops=float(a.get("model_flops", 0) or 0),
            bytes_accessed=float(a.get("raw_bytes_accessed",
                                       a.get("bytes_accessed", 0)) or 0),
            long_name=a.get("long_name", "")[:200],
        ))
    rows.sort(key=lambda r: -r.self_ms)
    return rows, win["dur"] / 1e3


def rollup(rows: List[OpRow]) -> List[Tuple[str, float, int, float]]:
    """(bucket, self_ms, n_ops, achieved TFLOP/s) sorted by time desc."""
    ms = collections.Counter()
    n = collections.Counter()
    fl = collections.Counter()
    for r in rows:
        ms[r.category] += r.self_ms
        n[r.category] += r.count
        fl[r.category] += r.flops * r.count
    out = []
    for cat, t in ms.most_common():
        tf = fl[cat] / (t / 1e3) / 1e12 if t > 0 else 0.0
        out.append((cat, t, n[cat], tf))
    return out


def report(log_dir: str | Path, top: int = 20, module_hint: str = "") -> str:
    rows, module_ms = analyze(log_dir, module_hint)
    total = sum(r.self_ms for r in rows)
    lines = [f"module window: {module_ms:.1f} ms on device "
             f"({total:.1f} ms accounted in op self-times)", "",
             "== category rollup ==",
             f"{'bucket':44s} {'ms':>9s} {'%':>6s} {'ops':>6s} {'TFLOP/s':>8s} {'MFU%':>5s}"]
    for cat, ms, n, tf in rollup(rows):
        lines.append(f"{cat:44s} {ms:9.2f} {100*ms/total:5.1f}% {n:6d} "
                     f"{tf:8.1f} {100*tf*1e12/PEAK_FLOPS:5.1f}")
    lines += ["", "== top ops by self time ==",
              f"{'op':28s} {'ms':>9s} {'calls':>6s} {'TFLOP/s':>8s} {'GB/s':>7s}  bucket"]
    for r in rows[:top]:
        lines.append(f"{r.name:28s} {r.self_ms:9.2f} {r.count:6d} "
                     f"{r.tflops:8.1f} {r.gbps:7.1f}  {r.category}")
    return "\n".join(lines)


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "outputs/profile"
    print(report(d, top=int(sys.argv[2]) if len(sys.argv) > 2 else 20))
