"""Tracing / profiling utilities.

The reference instruments with wall-clock logs behind `enable_debug`
(localization_node.cpp:286-287,350-353 "CALLBACK TOOK %f seconds"; ICP
step prints icp_point_to_point.cpp:172-183). TPU equivalents:

* `StageTimer` — named wall-clock stages around `block_until_ready`,
  printable like the reference's debug log;
* `trace(dir)` — context manager around `jax.profiler.trace` for full
  device timelines;
* `summarize_trace(dir)` — host-side aggregation of a captured trace's
  device ops by total duration (what we used to find the cond-dispatch
  bottleneck in the ICP loop).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Wall-clock stage timer with device synchronization."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"TOTAL {total * 1000:.2f} ms"]
        for k, v in sorted(self.stages.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k}: {v * 1000:.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def summarize_trace(log_dir: str, top: int = 25) -> list[tuple[str, float, int]]:
    """Aggregate device ops of the newest trace in log_dir by duration.

    Returns [(op_name, total_ms, count)] sorted by total duration.
    """
    files = sorted(
        glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not files:
        return []
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("$"):  # python-side frames
                continue
            dur[name] += e["dur"]
            cnt[name] += 1
    out = sorted(dur.items(), key=lambda kv: -kv[1])[:top]
    return [(name, d / 1000.0, cnt[name]) for name, d in out]
