"""Multi-host glue: chunk planning, recovery sets, bootstrap no-op path."""

import pathlib

import numpy as np

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


def test_elastic_redispatch_roundtrip():
    """End-to-end recovery drill (SURVEY.md §5 failure detection): host 1 of
    2 'fails' mid-encode; missing_chunks names its range, which is
    re-encoded via TPUCodec.encode_chunk_range (the restartable fixed-grid
    stage) and spliced into the manifest; the assembled v3 container must
    equal the healthy single-pass one and round-trip."""
    import zlib

    import numpy as np

    from huffman_codec_tpu.models import CodecConfig, TPUCodec

    cs, n_chunks = 1024, 8
    rng = np.random.default_rng(11)
    raw = bytes(rng.integers(0, 12, cs * n_chunks - 301, dtype=np.uint8))
    codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=cs, lane=128,
                                 entropy="canonical", layout="sharded"))

    plan = plan_chunk_ranges(n_chunks, 2)
    done: set[int] = set()
    parts: dict[int, tuple] = {}
    for r in plan:
        if r.host == 1:
            continue  # host 1 dies before reporting
        parts[r.start] = codec.encode_chunk_range(raw, r.start, r.stop)
        done.update(range(r.start, r.stop))

    todo = missing_chunks(n_chunks, done)
    assert todo == list(range(plan[1].start, plan[1].stop))
    # coordinator re-dispatches the missing contiguous range on host 0
    parts[todo[0]] = codec.encode_chunk_range(raw, todo[0], todo[-1] + 1)

    # assemble exactly like TPUCodec.encode does for the canonical 6-tuple
    # (lane_buf, lane_words, tables, None, rle_lens, carries)
    cols = [np.concatenate([np.asarray(parts[k][i])
                            for k in sorted(parts)]) for i in (0, 1, 2, 4, 5)]
    buf, lw, tables, rle_lens, carries = cols
    col = np.arange(buf.shape[2])
    payload = b"".join(
        buf[c].astype(">u4")[col[None, :] < lw[c][:, None]].tobytes()
        for c in range(n_chunks))
    chunk_bits = (lw[:n_chunks].sum(axis=1, dtype=np.int64) * 32).tolist()
    blob = codec._container(payload, len(raw), int(rle_lens[:n_chunks].sum()),
                            chunk_bits, None, tables[:n_chunks],
                            lw[:n_chunks],
                            (rle_lens[:n_chunks], carries[:n_chunks]),
                            zlib.crc32(raw))
    assert blob == codec.encode(raw), "recovered container != healthy one"
    assert codec.decode(blob) == raw


def test_mesh_adaptive_encode_matches_single_chip():
    """distributed_adapt_encode_step (bands data-parallel over the mesh,
    diff carry via ppermute) must produce exactly the single-chip
    sharded-adaptive stage's manifest columns."""
    import jax.numpy as jnp

    from huffman_codec_tpu.models.chunked import (
        _encode_sharded_adapt_stage, _sharded_cap)
    from huffman_codec_tpu.parallel.mesh import (
        default_mesh, distributed_adapt_encode_step)

    raw = pathlib.Path("/root/reference/data/hd01.raw").read_bytes()[:131072]
    arr = np.frombuffer(raw, np.uint8)
    w, band_h, bs, lane = 512, 32, 16, 64
    cs = band_h * w
    out = distributed_adapt_encode_step(
        jnp.asarray(arr), default_mesh(), w, band_h, bs, True,
        "canonical", lane)
    bands = arr.reshape(-1, cs)
    car = np.zeros((bands.shape[0],), np.uint8)
    car[1:] = bands[:-1, -1]
    ref = _encode_sharded_adapt_stage(
        jnp.asarray(bands), jnp.asarray(car), True, w, band_h, bs,
        _sharded_cap(cs, "canonical", lane), "canonical", lane)
    expect = [ref[0], ref[1], ref[2], ref[4], ref[5], ref[6], car]
    for got, exp in zip(out, expect):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_mesh_adaptive_search_psum():
    """Distributed block-size search: per-shard candidate scores psum
    over the mesh; the argmin must be stable and scores positive."""
    import jax.numpy as jnp

    from huffman_codec_tpu.ops.adapt import candidate_sizes
    from huffman_codec_tpu.parallel.mesh import (
        default_mesh, distributed_adapt_search)

    raw = pathlib.Path("/root/reference/data/hd01.raw").read_bytes()[:131072]
    arr = np.frombuffer(raw, np.uint8)
    scores = np.asarray(distributed_adapt_search(
        jnp.asarray(arr), default_mesh(), 512, 32, True))
    cands = candidate_sizes(512, 32)
    assert scores.shape == (len(cands),)
    assert (scores > 0).all()
    # two runs agree (deterministic collective)
    scores2 = np.asarray(distributed_adapt_search(
        jnp.asarray(arr), default_mesh(), 512, 32, True))
    np.testing.assert_array_equal(scores, scores2)


def test_mesh_adaptive_roundtrip():
    """distributed_adapt_encode_step -> distributed_adapt_decode_step
    over the virtual mesh reconstructs the input exactly."""
    import jax.numpy as jnp

    from huffman_codec_tpu.models.chunked import _n_words_for, _sharded_cap
    from huffman_codec_tpu.parallel.mesh import (
        default_mesh, distributed_adapt_decode_step,
        distributed_adapt_encode_step)

    raw = pathlib.Path("/root/reference/data/hd01.raw").read_bytes()[:131072]
    arr = np.frombuffer(raw, np.uint8)
    w, band_h, bs, lane = 512, 32, 16, 64
    mesh = default_mesh()
    (buf, lw, tables, totals, dirs, tlens,
     carries) = distributed_adapt_encode_step(
        jnp.asarray(arr), mesh, w, band_h, bs, True, "canonical", lane)
    cap = _sharded_cap(band_h * w, "canonical", lane)
    wpc = _n_words_for(cap, "canonical", lane)
    out = distributed_adapt_decode_step(
        buf.reshape(buf.shape[0], wpc), totals, tlens, dirs, carries,
        tables, lw, mesh, w, band_h, bs, True, lane)
    assert bytes(np.asarray(out)[: len(raw)]) == raw
