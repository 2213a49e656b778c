"""Per-operation latency metrics for the serving engine — the Spark
analog of the reference's bvar LatencyRecorder sink (``server.cpp``:
``g_*_latency`` counters; benchmark readout ``client_bench.cpp:152-160``).

The reference aggregates latency percentiles in a background thread per
RPC type; here each VectorEngine op (search / insert / compact) records
its wall time into a bounded in-driver reservoir, and ``snapshot()``
exposes count / avg / p50 / p99 / p999 per op.  Driver-side on purpose:
op latency is a *driver-visible* quantity (a Spark action), so no
distributed state is involved — at cluster scale this is exactly the
metrics surface a serving layer in front of Spark would export.
"""

from __future__ import annotations

import numpy as np


class MetricsRecorder:
    """Bounded-reservoir latency recorder, one series per op name."""

    def __init__(self, max_samples: int = 10_000):
        self.max_samples = max_samples
        self._series: dict[str, list[float]] = {}
        self._counts: dict[str, int] = {}

    def record(self, op: str, seconds: float) -> None:
        s = self._series.setdefault(op, [])
        self._counts[op] = self._counts.get(op, 0) + 1
        if len(s) < self.max_samples:
            s.append(seconds)
        else:  # deterministic reservoir: overwrite round-robin
            s[self._counts[op] % self.max_samples] = seconds

    def snapshot(self) -> list[dict]:
        out = []
        for op in sorted(self._series):
            lat_ms = np.sort(np.array(self._series[op])) * 1000.0
            out.append(
                {
                    "op": op,
                    "count": int(self._counts[op]),
                    "avg_ms": round(float(lat_ms.mean()), 3),
                    "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
                    "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
                    "p999_ms": round(float(np.percentile(lat_ms, 99.9)), 3),
                }
            )
        return out
