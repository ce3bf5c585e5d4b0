"""Tracing/profiling hooks (SURVEY.md §5 tracing row).

The reference has no profiler — ad-hoc segment timestamps only.  Here
profiling is a first-class serving option: ``trace(dir)`` wraps any region
in a ``jax.profiler`` trace (viewable in XProf/TensorBoard, includes TPU
device timelines + HLO names), and ``annotate(name)`` labels host-side
phases so chunk boundaries are visible alongside device ops.

Usage:
    with trace("/tmp/jax-trace"):           # or serve --profile_dir ...
        server.step(chunks)
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace over the with-block; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-span context manager; shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def step_annotation(step: int):
    """Marks one serving/training step; XProf groups device ops under it."""
    return jax.profiler.StepTraceAnnotation("step", step_num=step)
