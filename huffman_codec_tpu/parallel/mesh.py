"""Data-parallel codec steps over a device mesh.

Sharding design (SURVEY.md §2.8 / §5): the input byte stream is cut into
fixed-size chunks; chunks are the unit of data parallelism. Per chunk the
whole pipeline — diff model, MNP-5 RLE, entropy coding, bit packing — is
independent, EXCEPT the diff model's first byte, which needs the last
input byte of the previous chunk. That single-byte carry is exchanged with
one ``ppermute`` over the mesh axis; the per-chunk manifest (bit lengths,
RLE lengths, code tables) is assembled with ``all_gather``. Everything
else is local, so scaling is embarrassingly parallel and collective
traffic is O(devices + manifest).

This realizes the v3 container's "sharded" layout exactly — the outputs of
``distributed_encode_step`` are the same manifest columns
``models/chunked.py:_encode_sharded_stage``
produces, so a v3 sharded container assembled from a mesh encode is
byte-identical to the single-chip one (pinned by ``__graft_entry__``'s
dryrun and tests/test_distributed.py). Both entropy modes ride the mesh:
``canonical`` (the flagship two-pass coder) and ``fgk`` (reference parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from huffman_codec_tpu.ops.canonical import (
    canonical_decode_batch,
    canonical_encode_batch,
)
from huffman_codec_tpu.ops.diff import diff_revert
from huffman_codec_tpu.ops.fgk import fgk_decode_batch, fgk_encode_batch
from huffman_codec_tpu.ops.rle import rle_decode, rle_encode, rle_max_encoded_len


def default_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_cap(chunk_size: int, entropy: str, lane: int) -> int:
    """Padded per-chunk RLE buffer length; canonical rounds to whole
    8-lane blocks (the Pallas kernel's row granularity) — must match
    models/chunked.py:_sharded_cap for container parity."""
    cap = rle_max_encoded_len(chunk_size)
    blk = 8 * lane
    return -(-cap // blk) * blk if entropy == "canonical" else cap


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "chunk_size", "n_words", "use_diff", "entropy",
                     "lane", "axis"),
)
def distributed_encode_step(
    data: jax.Array,
    length: jax.Array,
    mesh: Mesh,
    chunk_size: int,
    n_words: int,
    use_diff: bool = True,
    entropy: str = "fgk",
    lane: int = 512,
    axis: str = "dp",
):
    """One sharded encode step over the mesh.

    ``data`` is uint8[n_chunks * chunk_size] (padded), ``length`` the true
    byte count; n_chunks must divide by the mesh size. Returns the
    replicated v3 sharded manifest columns, gathered over ICI:
    canonical -> (lane_buf (C, n_lanes, W), lane_words (C, n_lanes),
    tables, rle_lens, carries); fgk -> (words (C, n_words), bits (C,),
    None, rle_lens, carries). ``n_words`` only applies to fgk.
    """
    n = data.shape[0]
    n_chunks = n // chunk_size
    cap = sharded_cap(chunk_size, entropy, lane)
    chunks = data.reshape(n_chunks, chunk_size)
    lengths = jnp.clip(
        length - jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size,
        0, chunk_size,
    )

    out_specs = ((P(None, None), P(None), P(None), P(None))
                 if entropy == "fgk"
                 else (P(None, None, None), P(None, None), P(None, None),
                       P(None), P(None)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    def step(local_chunks, local_lengths):
        if use_diff:
            # diff carry = last input byte of the previous chunk; interior
            # chunks are full so [:, -1] is that byte. The shard-crossing
            # carry rides one ppermute (SURVEY.md §5); device 0 uses the
            # implicit prev=0 of the whole stream (transform.cpp:222).
            last = local_chunks[:, -1]
            idx = jax.lax.axis_index(axis)
            nd = jax.lax.axis_size(axis)
            prev_last = jax.lax.ppermute(
                last[-1], axis, [(i, (i + 1) % nd) for i in range(nd)]
            )
            first_carry = jnp.where(idx == 0, jnp.uint8(0), prev_last)
            carries = jnp.concatenate([first_carry[None], last[:-1]])
            prev = jnp.concatenate(
                [carries[:, None], local_chunks[:, :-1]], axis=1
            )
            work = (local_chunks - prev).astype(jnp.uint8)
        else:
            carries = jnp.zeros((local_chunks.shape[0],), jnp.uint8)
            work = local_chunks
        enc = jax.vmap(lambda x, l: rle_encode(x, l, out_len=cap))
        rle_streams, rle_lens = enc(work, local_lengths)
        if entropy == "canonical":
            buf, lane_words, tables = canonical_encode_batch(
                rle_streams, rle_lens, lane=lane)
            # ordered manifest + stream assembly over ICI
            return tuple(
                jax.lax.all_gather(x, axis, tiled=True)
                for x in (buf, lane_words, tables, rle_lens, carries))
        words, bits = fgk_encode_batch(rle_streams, rle_lens, n_words)
        return tuple(
            jax.lax.all_gather(x, axis, tiled=True)
            for x in (words, bits, rle_lens, carries))

    out = step(chunks, lengths)
    if entropy == "fgk":
        words, bits, rle_lens, carries = out
        return words, bits, None, rle_lens, carries
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "band_h", "use_diff", "axis"),
)
def distributed_adapt_search(
    data: jax.Array,
    mesh: Mesh,
    width: int,
    band_h: int,
    use_diff: bool = True,
    axis: str = "dp",
):
    """Distributed block-size search: every shard scores each candidate
    on ITS bands (closed-form emission sizes + local emission-histogram
    entropy estimate), local scores ``psum`` over the mesh axis (the
    SURVEY §2.8 "size reduction for block-size argmin" collective), and
    the replicated argmin picks the block size — first minimum wins, the
    reference's smaller-bs tie rule. Returns int32[n_candidates] summed
    scores; pair with ``candidate_sizes(width, band_h)``."""
    from huffman_codec_tpu.ops.adapt import _adapt_score_v3, candidate_sizes
    from huffman_codec_tpu.ops.diff import diff_apply

    cs = band_h * width
    n_bands = data.shape[0] // cs
    bands = data.reshape(n_bands, cs)
    cands = candidate_sizes(width, band_h)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=P(None),
        check_vma=False,
    )
    def step(local_bands):
        local = local_bands.reshape(-1)
        x = diff_apply(local) if use_diff else local
        rows = local.shape[0] // width
        scores = jnp.stack(
            [_adapt_score_v3(x, width, rows, b) for b in cands])
        return jax.lax.psum(scores, axis)

    return step(bands)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "band_h", "bs", "use_diff", "entropy",
                     "lane", "axis"),
)
def distributed_adapt_encode_step(
    data: jax.Array,
    mesh: Mesh,
    width: int,
    band_h: int,
    bs: int,
    use_diff: bool = True,
    entropy: str = "canonical",
    lane: int = 512,
    axis: str = "dp",
):
    """Sharded-ADAPTIVE encode over the mesh: bands of ``band_h`` full
    matrix rows are the data-parallel unit (models/chunked.py
    `_encode_sharded_adapt_stage` semantics — adaptive block RLE per
    band, one global block size). The diff carry crosses shards with one
    ``ppermute``; manifests gather over ICI. ``data`` must be
    n_bands * band_h * width bytes with n_bands divisible by the mesh
    size. Returns replicated (lane_buf, lane_words, tables, stream_lens,
    dirs, tile_lens, carries)."""
    from huffman_codec_tpu.ops.adapt import adapt_encode_fixed

    cs = band_h * width
    n_bands = data.shape[0] // cs
    bands = data.reshape(n_bands, cs)
    cap = sharded_cap(cs, entropy, lane)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=tuple(P(None, *(None,) * k)
                        for k in (2, 1, 1, 0, 1, 1, 0)),
        check_vma=False,
    )
    def step(local_bands):
        last = local_bands[:, -1]
        idx = jax.lax.axis_index(axis)
        nd = jax.lax.axis_size(axis)
        prev_last = jax.lax.ppermute(
            last[-1], axis, [(i, (i + 1) % nd) for i in range(nd)])
        first_carry = jnp.where(idx == 0, jnp.uint8(0), prev_last)
        carries = jnp.concatenate([first_carry[None], last[:-1]])
        if use_diff:
            prev = jnp.concatenate(
                [carries[:, None], local_bands[:, :-1]], axis=1)
            work = (local_bands - prev).astype(jnp.uint8)
            work = jax.lax.optimization_barrier(work)
        else:
            work = local_bands
        enc = jax.vmap(lambda m: adapt_encode_fixed(
            m, width, band_h, bs, out_len=cap, with_header=False))
        streams, totals, dirs, tile_lens = enc(work)
        totals = totals.astype(jnp.int32)
        buf, lane_words, tables = canonical_encode_batch(
            streams, totals, lane=lane)
        return tuple(
            jax.lax.all_gather(x, axis, tiled=True)
            for x in (buf, lane_words, tables, totals, dirs, tile_lens,
                      carries))

    return step(bands)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "band_h", "bs", "use_diff", "lane",
                     "axis"),
)
def distributed_adapt_decode_step(
    words: jax.Array,
    stream_lens: jax.Array,
    tile_lens: jax.Array,
    dirs: jax.Array,
    carries: jax.Array,
    tables: jax.Array,
    lane_words: jax.Array,
    mesh: Mesh,
    width: int,
    band_h: int,
    bs: int,
    use_diff: bool = True,
    lane: int = 512,
    axis: str = "dp",
):
    """Inverse of ``distributed_adapt_encode_step``: per-band entropy
    decode + manifest-parallel tile decode + per-band diff revert shard
    across the mesh; one ``all_gather`` assembles the rows. ``words`` is
    the padded fixed-stride lane layout (n_bands, n_lanes * Wl)."""
    from huffman_codec_tpu.ops.adapt import adapt_decode_tiled

    cs = band_h * width
    cap = sharded_cap(cs, "canonical", lane)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None), P(axis, None),
                  P(axis), P(axis, None), P(axis, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    def step(lw_words, lsl, ltl, ldirs, lcar, ltab, llw):
        streams = canonical_decode_batch(
            lw_words, ltab, llw, lsl, lane=lane, out_len=cap)
        dec = jax.vmap(lambda s, tl, d: adapt_decode_tiled(
            s, tl, d, width, band_h, bs))
        out = dec(streams, ltl, ldirs)
        if use_diff:
            out = jax.vmap(lambda y, cin: diff_revert(y, cin))(out, lcar)
        return jax.lax.all_gather(out, axis, tiled=True)

    return step(words, stream_lens.astype(jnp.int32),
                tile_lens.astype(jnp.int32), dirs, carries, tables,
                lane_words).reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "chunk_size", "use_diff", "entropy", "lane",
                     "axis"),
)
def distributed_decode_step(
    words: jax.Array,
    rle_lens: jax.Array,
    carries: jax.Array,
    mesh: Mesh,
    chunk_size: int,
    tables: jax.Array | None = None,
    lane_words: jax.Array | None = None,
    use_diff: bool = True,
    entropy: str = "fgk",
    lane: int = 512,
    axis: str = "dp",
):
    """Inverse of distributed_encode_step: per-chunk entropy + RLE decode
    shard across the mesh; the diff revert is per-chunk too, seeded by the
    manifest carries (so no global pass — same shape as the streaming
    single-chip decode). Returns uint8[n_chunks * chunk_size] (padded only
    inside the tail chunk)."""
    cap = sharded_cap(chunk_size, entropy, lane)

    if entropy == "canonical":
        in_specs = (P(axis, None), P(axis), P(axis), P(axis, None),
                    P(axis, None))
        args = (words, rle_lens, carries, tables, lane_words)
    else:
        in_specs = (P(axis, None), P(axis), P(axis))
        args = (words, rle_lens, carries)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(None, None),
        check_vma=False,
    )
    def step(local_words, local_rle_lens, local_carries, *rest):
        if entropy == "canonical":
            local_tables, local_lane_words = rest
            streams = canonical_decode_batch(
                local_words, local_tables, local_lane_words, local_rle_lens,
                lane=lane, out_len=cap)
        else:
            streams = fgk_decode_batch(local_words, local_rle_lens, cap)
        dec = jax.vmap(lambda s, l: rle_decode(s, l, out_len=chunk_size)[0])
        chunks = dec(streams, local_rle_lens)
        if use_diff:
            chunks = jax.vmap(lambda y, cin: diff_revert(y, cin))(
                chunks, local_carries)
        return jax.lax.all_gather(chunks, axis, tiled=True)

    return step(*args).reshape(-1)
