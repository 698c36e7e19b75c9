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


def device_time(fn, args, reps_hi=9, reps_lo=1, label="", quiet=False):
    """True device time of ``fn(*args)`` through a high-latency dispatch
    path (the axon tunnel): run the op ``reps`` times inside one jitted
    ``lax.fori_loop`` whose iterations are data-dependent (so they
    serialize), force completion with a 1-element fetch, and difference two
    rep counts to cancel dispatch+fetch overhead. Returns seconds/call."""
    import functools
    import sys
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(x0, rest, reps: int):
        def body(i, x):
            out = fn(x, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            bit = jnp.uint8(0)
            for lf in leaves:
                bit = bit ^ (jnp.sum(lf.astype(jnp.int32) & 1)
                             & 1).astype(jnp.uint8)
            return x ^ bit  # serializing dependence, value-preserving ^0..1
        return jax.lax.fori_loop(0, reps, body, x0)

    x0, rest = args[0], tuple(args[1:])
    t0 = time.perf_counter()
    out = chained(x0, rest, reps_lo)
    _ = np.asarray(out.reshape(-1)[:1])
    compile_s = time.perf_counter() - t0

    def run(reps):
        t0 = time.perf_counter()
        out = chained(x0, rest, reps)
        _ = np.asarray(out.reshape(-1)[:1])
        return time.perf_counter() - t0

    run(reps_hi)  # compile hi variant
    t_lo = min(run(reps_lo) for _ in range(3))
    t_hi = min(run(reps_hi) for _ in range(3))
    dt = (t_hi - t_lo) / (reps_hi - reps_lo)
    if not quiet:
        print(f"{label:28s} compile {compile_s:7.2f}s   device "
              f"{dt*1e3:9.3f} ms", file=sys.stderr, flush=True)
    return dt


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
