"""Per-stage timing/throughput metrics + optional jax.profiler traces.

The reference has zero timing code (SURVEY.md §5). Here every pipeline
stage can be wrapped in `stage_timer`, which:
  * annotates the XLA trace (jax.profiler.TraceAnnotation) so device
    profiles group by pipeline stage,
  * records wall time and voxel throughput into a StageMetrics registry,
  * optionally emits a JSON metrics line per stage.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

from ife_tpu.utils.logging import log_json


@dataclass
class StageRecord:
    name: str
    seconds: float
    voxels: Optional[int] = None

    @property
    def voxels_per_sec(self) -> Optional[float]:
        if self.voxels is None or self.seconds <= 0:
            return None
        return self.voxels / self.seconds


@dataclass
class StageMetrics:
    records: List[StageRecord] = field(default_factory=list)

    def add(self, rec: StageRecord) -> None:
        self.records.append(rec)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for r in self.records:
            s = out.setdefault(r.name, {"seconds": 0.0, "calls": 0})
            s["seconds"] += r.seconds
            s["calls"] += 1
            if r.voxels_per_sec is not None:
                s["voxels_per_sec"] = r.voxels_per_sec
        return out


_global_metrics = StageMetrics()


def global_metrics() -> StageMetrics:
    return _global_metrics


@contextlib.contextmanager
def stage_timer(
    name: str,
    voxels: Optional[int] = None,
    metrics: Optional[StageMetrics] = None,
    emit: bool = False,
):
    """Time a pipeline stage; annotates the device trace with `name`.

    Note: timings include host time; for pure device time use
    jax.profiler.trace + a profile viewer. Callers should block on results
    inside the context for meaningful numbers.
    """
    m = metrics if metrics is not None else _global_metrics
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    rec = StageRecord(name=name, seconds=dt, voxels=voxels)
    m.add(rec)
    if emit:
        payload = {"stage": name, "seconds": round(dt, 6)}
        if rec.voxels_per_sec is not None:
            payload["voxels_per_sec"] = round(rec.voxels_per_sec, 1)
        log_json("stage", payload)
