"""Data-parallel codec steps over a device mesh.

Sharding design (SURVEY.md §2.8 / §5): the input byte stream is cut into
fixed-size chunks; chunks are the unit of data parallelism. Per chunk the
whole pipeline — diff model, MNP-5 RLE, FGK entropy coding, bit packing —
is independent, EXCEPT the diff model's first byte, which needs the last
input byte of the previous chunk. That single-byte carry is exchanged with
one ``ppermute`` over the mesh axis; the per-chunk manifest (bit lengths,
RLE lengths) is assembled with ``all_gather``. Everything else is local,
so scaling is embarrassingly parallel and collective traffic is O(devices).

This realizes the v3 container's "sharded" layout: transforms applied per
input chunk (RLE restarts at chunk boundaries) so decode is equally
parallel; the diff revert happens once globally after reassembly (a global
cumsum — also parallel). Interior chunks are always full, so output
compaction is a single tail truncation.
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

from huffman_codec_tpu.ops.diff import diff_revert
from huffman_codec_tpu.ops.fgk import fgk_decode_batch, fgk_encode_batch
from huffman_codec_tpu.ops.rle import rle_decode, rle_encode, rle_max_encoded_len


def default_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "chunk_size", "n_words", "use_diff", "axis"),
)
def distributed_encode_step(
    data: jax.Array,
    length: jax.Array,
    mesh: Mesh,
    chunk_size: int,
    n_words: int,
    use_diff: bool = True,
    axis: str = "dp",
):
    """One sharded encode step over the mesh.

    ``data`` is uint8[n_chunks * chunk_size] (padded), ``length`` the true
    byte count; n_chunks must divide by the mesh size. Returns replicated
    (words (C, n_words), bits (C,), rle_lens (C,)) — per-chunk packed
    streams plus the manifest, gathered over ICI.
    """
    n = data.shape[0]
    n_chunks = n // chunk_size
    rle_cap = rle_max_encoded_len(chunk_size)
    chunks = data.reshape(n_chunks, chunk_size)
    lengths = jnp.clip(
        length - jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size,
        0, chunk_size,
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(None, None), P(None), P(None)),
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
            work = local_chunks
        enc = jax.vmap(lambda x, l: rle_encode(x, l, out_len=rle_cap))
        rle_streams, rle_lens = enc(work, local_lengths)
        words, bits = fgk_encode_batch(rle_streams, rle_lens, n_words)
        # ordered manifest + stream assembly over ICI
        words = jax.lax.all_gather(words, axis, tiled=True)
        bits = jax.lax.all_gather(bits, axis, tiled=True)
        rle_lens = jax.lax.all_gather(rle_lens, axis, tiled=True)
        return words, bits, rle_lens

    return step(chunks, lengths)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "chunk_size", "use_diff", "axis"),
)
def distributed_decode_step(
    words: jax.Array,
    rle_lens: jax.Array,
    chunk_lengths: jax.Array,
    mesh: Mesh,
    chunk_size: int,
    use_diff: bool = True,
    axis: str = "dp",
):
    """Inverse of distributed_encode_step: per-chunk FGK + RLE decode shard
    across the mesh; the diff revert is one global cumsum afterwards.
    Returns the reconstructed uint8[n_chunks * chunk_size] (padded only at
    the stream tail)."""
    rle_cap = rle_max_encoded_len(chunk_size)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=P(None, None),
        check_vma=False,
    )
    def step(local_words, local_rle_lens, local_counts):
        streams = fgk_decode_batch(local_words, local_rle_lens, rle_cap)
        dec = jax.vmap(lambda s, l: rle_decode(s, l, out_len=chunk_size)[0])
        chunks = dec(streams, local_rle_lens)
        return jax.lax.all_gather(chunks, axis, tiled=True)

    chunks = step(words, rle_lens, chunk_lengths)
    flat = chunks.reshape(-1)
    if use_diff:
        # zero the tail padding so the global cumsum carries cleanly
        idx = jnp.arange(chunk_size, dtype=jnp.int32)[None, :]
        mask = (idx < chunk_lengths[:, None]).reshape(-1)
        flat = diff_revert(jnp.where(mask, flat, 0))
    return flat
