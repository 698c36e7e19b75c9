"""Per-stage wall timers + jax.profiler trace capture.

Usage::

    with StageTimer() as t:
        with t.stage("rle"):
            ...
        with t.stage("fgk"):
            ...
    print(t.report())

    with device_trace("/tmp/trace"):   # opens in XProf / Perfetto
        run_pipeline()
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    stages: dict[str, float] = field(default_factory=dict)
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.stages.setdefault("total", time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time one stage; pass ``sync=jax_array`` to block on device work
        (device dispatch is async — without a sync the timing is a lie)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = self.stages.get("total") or sum(self.stages.values())
        lines = []
        for name, dt in sorted(self.stages.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * dt / total if total else 0.0
            lines.append(f"{name:>16s}  {dt * 1e3:9.2f} ms  {pct:5.1f}%")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (no-op if the profiler is unavailable)."""
    try:
        import jax.profiler as prof

        prof.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                prof.stop_trace()
            except Exception:
                pass
