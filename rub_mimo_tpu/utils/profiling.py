"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock time() stamps around
the tx/rx workers printed as runtimes and a bit rate (mimo/main.cc:49,
864, 900, 1024, 1133, 1462-1465).  Here:

  - `trace(dir)`: jax.profiler context writing a TensorBoard-loadable
    device trace of the decode
  - `StageTimer`: per-stage wall-clock + samples/s counters (the
    north-star metric is IQ samples/s/chip per stage)
  - `annotate`: named trace spans (jax.profiler.TraceAnnotation)
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (also works as a decorator context)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclasses.dataclass
class StageRecord:
    name: str
    seconds: float
    samples: int = 0

    @property
    def samples_per_second(self) -> float:
        return self.samples / self.seconds if self.seconds > 0 else 0.0


class StageTimer:
    """Wall-clock stage timer with IQ-samples/s accounting.

    Blocks on the stage's outputs (jax async dispatch would otherwise
    attribute all device time to whoever blocks first).
    """

    def __init__(self):
        self.records: List[StageRecord] = []

    @contextlib.contextmanager
    def stage(self, name: str, samples: int = 0, block_on=None):
        import jax

        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.records.append(
            StageRecord(name, time.perf_counter() - t0, samples)
        )

    def time_stage(self, name: str, fn, *args, samples: int = 0, iters: int = 1):
        """Run fn(*args) `iters` times, record the best, return the output."""
        import jax

        out = fn(*args)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        self.records.append(StageRecord(name, best, samples))
        return out

    def report(self) -> Dict:
        return {
            r.name: {
                "seconds": r.seconds,
                "samples": r.samples,
                "samples_per_second": r.samples_per_second,
            }
            for r in self.records
        }

    def to_json(self) -> str:
        return json.dumps(self.report(), indent=2)

    def print(self) -> None:
        for r in self.records:
            sps = f"  {r.samples_per_second:.3e} samples/s" if r.samples else ""
            print(f"    {r.name:<24}: {r.seconds * 1e3:8.3f} ms{sps}")
