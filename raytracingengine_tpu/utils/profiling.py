"""Device profiling as a framework capability.

The reference's entire observability story is one chrono timer around
RenderImage (/root/reference/RaytracingEngine/RaytracingEngine.cpp:292-299).
Here: capture a `jax.profiler` device trace of any step function and
aggregate per-op device time — the tooling behind PROFILE.md, exposed as
a library API (closes SURVEY §5 "tracing/profiling").

    from raytracingengine_tpu.utils.profiling import profile_step
    report = profile_step(lambda: train_step(params))
    print(report.pretty())   # device ms by XLA op, device total, wall

Works on this image's tunneled TPU backend (verified: the trace contains
the real device tracks); on CPU the device tracks are absent and the
report degrades to wall-clock only.
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
import os
import tempfile
import time

import jax


@dataclasses.dataclass
class TraceReport:
    wall_ms: float
    device_total_ms: float
    op_ms: dict[str, float]          # XLA op name -> device ms
    module_ms: dict[str, float]      # XLA module -> device ms
    trace_dir: str

    def top_ops(self, n: int = 10) -> list[tuple[str, float]]:
        return sorted(self.op_ms.items(), key=lambda kv: -kv[1])[:n]

    def pretty(self, n: int = 10) -> str:
        lines = [
            f"wall {self.wall_ms:.1f} ms | device {self.device_total_ms:.1f} ms "
            f"| dispatch overhead {self.wall_ms - self.device_total_ms:.1f} ms"
        ]
        for name, ms in self.top_ops(n):
            lines.append(f"  {ms:9.3f} ms  {name[:100]}")
        return "\n".join(lines)


def parse_trace_dir(trace_dir: str) -> tuple[dict, dict]:
    """-> (op_ms, module_ms) from the newest trace.json.gz under dir."""
    cands = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not cands:
        return {}, {}
    with gzip.open(cands[-1], "rt") as f:
        evs = json.load(f)["traceEvents"]
    pid_name, tid_name = {}, {}
    for e in evs:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"]["name"]
    device_pids = {
        p for p, n in pid_name.items() if "TPU" in n or "/device:" in n
    }
    op_ms: dict = collections.defaultdict(float)
    module_ms: dict = collections.defaultdict(float)
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        track = tid_name.get((e["pid"], e.get("tid")), "")
        dur_ms = e.get("dur", 0.0) / 1e3  # trace stores microseconds
        if track == "XLA Ops":
            op_ms[e["name"]] += dur_ms
        elif track == "XLA Modules":
            module_ms[e["name"]] += dur_ms
    return dict(op_ms), dict(module_ms)


def profile_step(fn, trace_dir: str | None = None, warmup: int = 1) -> TraceReport:
    """Run `fn()` under a device trace -> TraceReport.

    `fn` should be a nullary closure over jitted work (compile outside or
    accept the first-call compile in `warmup`).
    """
    for _ in range(max(warmup, 0)):
        jax.block_until_ready(fn())
    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix="rte_trace_")
    os.makedirs(trace_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fn())
    wall_ms = (time.perf_counter() - t0) * 1e3
    op_ms, module_ms = parse_trace_dir(trace_dir)
    return TraceReport(
        wall_ms=wall_ms,
        device_total_ms=sum(module_ms.values()),
        op_ms=op_ms,
        module_ms=module_ms,
        trace_dir=trace_dir,
    )
