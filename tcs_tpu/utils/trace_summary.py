"""Parse a jax.profiler trace into per-op / per-module device-time tables.

The axon runtime's wall-clock is unreliable for long steps (dispatch returns
before device completion), so every benchmark in this repo validates against
the device timeline: leaf HLO events (those carrying an ``hlo_category``)
summed by name, by ``tf_op`` module path, and by category. ``while`` /
``conditional`` umbrella events are skipped — their children are counted
individually.

Shared by scripts/profile_step.py and scripts/bench_train.py.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from dataclasses import dataclass, field


@dataclass
class TraceSummary:
    total_ms: float = 0.0            # summed leaf-op device time (all steps)
    by_op: collections.Counter = field(default_factory=collections.Counter)
    by_module: collections.Counter = field(default_factory=collections.Counter)
    by_category: collections.Counter = field(default_factory=collections.Counter)
    jit_ms: dict = field(default_factory=dict)  # top-level jit_* umbrella time


def latest_trace_path(logdir: str) -> str | None:
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    return paths[-1] if paths else None


def summarize_trace(logdir: str, strip_prefixes: tuple = ()) -> TraceSummary:
    """Aggregate the newest trace under ``logdir``."""
    s = TraceSummary()
    path = latest_trace_path(logdir)
    if path is None:
        return s
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1000.0  # us → ms
        if name.startswith("jit_"):
            s.jit_ms[name] = s.jit_ms.get(name, 0.0) + dur
        cat = a.get("hlo_category")
        if not cat or cat in ("while", "conditional"):
            continue
        tf = a.get("tf_op", "?")
        for p in strip_prefixes:
            tf = tf.replace(p, "")
        tf = tf.replace("while/body/closed_call/", "scan/")
        s.by_module["/".join(tf.split("/")[:3])] += dur
        s.by_category[cat] += dur
        s.by_op[name] += dur
        s.total_ms += dur
    return s


def print_summary(s: TraceSummary, steps: int, top: int = 40, file=None):
    import sys
    file = file or sys.stdout
    total = max(s.total_ms, 1e-9)
    print(f"device total {s.total_ms:.2f} ms over {steps} steps "
          f"→ {s.total_ms / steps:.2f} ms/step (leaf ops)", file=file)
    for title, counter, n in (("module (tf_op prefix)", s.by_module, top),
                              ("hlo_category", s.by_category, 15),
                              ("hlo op", s.by_op, top)):
        print(f"\n{'ms/step':>9}  {'%':>5}  {title}", file=file)
        for name, ms in counter.most_common(n):
            print(f"{ms/steps:9.3f}  {100*ms/total:5.1f}  {name[:110]}",
                  file=file)
