"""Profiling capability: trace capture + per-op aggregation.

On the CPU test backend the trace has no device tracks, so the report
degrades to wall-clock; the TPU path (device tracks present, per-op
table) is exercised by profiling/profile_step.py and recorded in
PROFILE.md.
"""

import jax
import jax.numpy as jnp

from raytracingengine_tpu.utils.profiling import parse_trace_dir, profile_step


def test_profile_step_captures_and_parses(tmp_path):
    f = jax.jit(lambda x: jnp.sum(x * x + 1.0))
    x = jnp.arange(4096, dtype=jnp.float32)
    rep = profile_step(lambda: f(x), trace_dir=str(tmp_path))
    assert rep.wall_ms > 0.0
    assert rep.trace_dir == str(tmp_path)
    # Trace files exist and parse without error (device tracks absent on CPU).
    op_ms, module_ms = parse_trace_dir(str(tmp_path))
    assert isinstance(op_ms, dict) and isinstance(module_ms, dict)
    assert rep.pretty()  # formats
