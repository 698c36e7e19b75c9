"""Multi-host execution glue (jax.distributed) + elastic re-dispatch.

The reference is a single process (SURVEY.md §2.8). Scaling the codec past
one host needs exactly two things, both provided here:

1. process-group bootstrap: ``init_distributed()`` wraps
   ``jax.distributed.initialize`` so every host sees the global device set;
   the same ``shard_map`` code from parallel/mesh.py then runs unchanged
   over the multi-host mesh (collectives ride ICI within a slice, DCN
   across hosts).
2. chunk-manifest recovery: chunks are self-contained (SURVEY.md §5
   "failure detection"), so a failed host's chunk range can simply be
   re-encoded elsewhere. ``plan_chunk_ranges`` computes the per-host
   assignment; ``missing_chunks`` diffs a partial manifest against the
   plan so a coordinator can re-dispatch stragglers.

Single-host CI exercises the same code paths on the virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``); the
``jax.distributed`` bootstrap is a no-op there.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the JAX process group when running multi-host.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); returns True if a multi-process
    group was initialized, False for the single-process fast path.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if not coordinator or nproc <= 1:
        return False
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=nproc,
        process_id=pid,
    )
    return True


@dataclass(frozen=True)
class ChunkRange:
    host: int
    start: int  # first chunk index (inclusive)
    stop: int  # last chunk index (exclusive)


def plan_chunk_ranges(n_chunks: int, n_hosts: int) -> list[ChunkRange]:
    """Contiguous balanced assignment of chunk indices to hosts."""
    base, extra = divmod(n_chunks, n_hosts)
    out, pos = [], 0
    for h in range(n_hosts):
        take = base + (1 if h < extra else 0)
        out.append(ChunkRange(h, pos, pos + take))
        pos += take
    return out


def missing_chunks(n_chunks: int, done: set[int]) -> list[int]:
    """Chunks not yet present in a partial manifest — the re-dispatch set
    after a host failure (chunks are independent, so recovery is a simple
    re-encode of this list on any surviving host)."""
    return [c for c in range(n_chunks) if c not in done]
