"""Profiling / timing harness.

The reference has almost no tracing story (a commented `profiler="pytorch"`,
SURVEY.md §5.1).  Here:
  * `trace(logdir)`: context manager around jax.profiler (XProf/Perfetto
    traces viewable in TensorBoard's profile plugin);
  * `timed(fn)`: wall-clock timing with a scalar-fetch sync — under the
    axon relay `block_until_ready` can return before remote completion, so
    timing MUST fetch a value (see .claude/skills/verify/SKILL.md);
  * `throughput_report`: steps/sec + assets/sec helper for benches.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree: Any) -> float:
    """Reliable device sync: fetch one scalar from the first leaf."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 3,
          overhead_s: float = 0.0) -> Dict[str, float]:
    """Best-of-iters wall time of fn(*args) with scalar-fetch sync."""
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        sync(fn(*args))
        times.append(time.time() - t0 - overhead_s)
    return {"best_s": min(times), "mean_s": sum(times) / len(times)}


def throughput_report(seconds_per_step: float, global_batch: int
                      ) -> Dict[str, float]:
    return {"steps_per_sec": 1.0 / seconds_per_step,
            "samples_per_sec": global_batch / seconds_per_step}
