"""Multi-host glue: chunk planning, recovery sets, bootstrap no-op path."""

from huffman_codec_tpu.parallel.distributed import (
    ChunkRange,
    init_distributed,
    missing_chunks,
    plan_chunk_ranges,
)


def test_plan_balanced():
    plan = plan_chunk_ranges(10, 3)
    assert plan == [ChunkRange(0, 0, 4), ChunkRange(1, 4, 7),
                    ChunkRange(2, 7, 10)]
    assert plan[-1].stop == 10


def test_plan_more_hosts_than_chunks():
    plan = plan_chunk_ranges(2, 4)
    sizes = [r.stop - r.start for r in plan]
    assert sizes == [1, 1, 0, 0]


def test_missing_chunks_recovery_set():
    assert missing_chunks(5, {0, 2, 4}) == [1, 3]
    assert missing_chunks(3, {0, 1, 2}) == []


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert init_distributed() is False
