"""Per-stage TPU profiling of the flagship sharded codec path.

The axon tunnel makes naive timing useless: ``block_until_ready`` returns
immediately, every true sync costs ~26 ms round-trip, and host<->device
bandwidth is ~25-33 MB/s. True device time is measured here by running each
stage ``reps`` times inside one jitted ``lax.fori_loop`` whose iterations
are data-dependent (so they serialize), forcing completion with a 1-element
fetch, and differencing two rep counts to cancel dispatch+fetch overhead.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from huffman_codec_tpu.utils.profiling import device_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-size", type=int, default=1 << 16)
    ap.add_argument("--n-chunks", type=int, default=256)
    ap.add_argument("--lane", type=int, default=512)
    ap.add_argument("--file", default="/root/reference/data/hd01.raw")
    ap.add_argument("--stages", default="all",
                    help="comma list: rle,hist,lens,codes,pack,enc,dec,rdec")
    args = ap.parse_args()

    from huffman_codec_tpu.ops.rle import rle_encode, rle_decode
    from huffman_codec_tpu.ops.canonical import (
        histogram, build_lengths, assign_codes, canonical_decode_batch,
        canonical_encode_batch)
    from huffman_codec_tpu.models.chunked import (
        _encode_sharded_stage, _n_words_for, _sharded_cap)

    cs, C, lane = args.chunk_size, args.n_chunks, args.lane
    n = cs * C
    mb = n / 1e6
    want = set(args.stages.split(",")) if args.stages != "all" else None

    def on(k):
        return want is None or k in want

    print(f"grid: C={C} x cs={cs} = {mb:.1f} MB, lane={lane}, "
          f"platform={jax.devices()[0].platform}", file=sys.stderr, flush=True)

    raw = open(args.file, "rb").read()
    reps = -(-n // len(raw))
    data_np = np.frombuffer((raw * reps)[:n], np.uint8)
    chunks = jax.device_put(jnp.asarray(data_np.reshape(C, cs)))
    lens = jnp.full((C,), cs, jnp.int32)
    flat = jax.device_put(jnp.asarray(data_np))
    _ = np.asarray(chunks[0, :1])

    cap = _sharded_cap(cs, "canonical", lane)
    report = {}

    if on("rle"):
        renc = jax.vmap(lambda x, l: rle_encode(x, l, out_len=cap))
        report["rle"] = device_time(renc, (chunks, lens), label="rle_encode")

    # materialize intermediates once (also warms the real pipeline)
    renc = jax.jit(jax.vmap(lambda x, l: rle_encode(x, l, out_len=cap)))
    rle_streams, rle_lens = renc(chunks, lens)
    rle_lens = rle_lens.astype(jnp.int32)

    if on("hist"):
        report["hist"] = device_time(histogram, (rle_streams, rle_lens),
                                     label="histogram")
    counts = jax.jit(histogram)(rle_streams, rle_lens)

    if on("lens"):
        report["lens"] = device_time(build_lengths, (counts,),
                                     label="build_lengths")
    lens_t = jax.jit(build_lengths)(counts)

    if on("codes"):
        report["codes"] = device_time(assign_codes, (lens_t,),
                                      label="assign_codes")
    codes = jax.jit(assign_codes)(lens_t)

    if on("pack"):
        def gather_and_pack(streams, slens, lt, cd):
            from huffman_codec_tpu.ops.pallas_kernels import (
                lane_pack, lane_pack_xla)
            tables = cd.astype(jnp.uint32) | (lt.astype(jnp.uint32) << 26)
            fn = (lane_pack if jax.default_backend() != "cpu"
                  else lane_pack_xla)
            return fn(streams, slens, tables, lane)
        report["pack"] = device_time(
            gather_and_pack, (rle_streams, rle_lens, lens_t, codes),
            label="lane_pack (gather+pack)")

    if on("enc"):
        def full(d, l):
            return _encode_sharded_stage(d, l, jnp.uint8(0), True, cs, C,
                                         "canonical", lane)
        report["enc"] = device_time(full, (flat, jnp.int32(n)),
                                    label="FULL sharded encode")
        print(f"  -> encode {mb / report['enc']:8.1f} MB/s",
              file=sys.stderr, flush=True)

    enc_out = jax.jit(lambda d, l: _encode_sharded_stage(
        d, l, jnp.uint8(0), True, cs, C, "canonical", lane))(
            flat, jnp.int32(n))
    buf_e, lw_e, tables_e, rl = enc_out[0], enc_out[1], enc_out[2], enc_out[4]
    # decode consumes the padded fixed-stride lane layout = the lane buffer
    wpc = _n_words_for(cap, "canonical", lane)
    words_e = buf_e.reshape(C, wpc)
    lane_words_e = lw_e

    if on("dec"):
        def dec(w, t, lb, c):
            return canonical_decode_batch(w, t, lb, c, lane=lane, out_len=cap)
        report["dec"] = device_time(
            dec, (words_e, tables_e, lane_words_e, rl.astype(jnp.int32)),
            label="canonical_decode")
        print(f"  -> entropy decode {mb / report['dec']:8.1f} MB/s",
              file=sys.stderr, flush=True)

    if on("rdec"):
        streams_d = jax.jit(lambda w, t, lb, c: canonical_decode_batch(
            w, t, lb, c, lane=lane, out_len=cap))(
                words_e, tables_e, lane_words_e, rl.astype(jnp.int32))
        rdec = jax.vmap(lambda s, l: rle_decode(s, l, out_len=cs)[0])
        report["rdec"] = device_time(rdec, (streams_d, rl.astype(jnp.int32)),
                                     label="rle_decode")

    print("\nsummary (device ms / MB/s):", file=sys.stderr)
    for k, v in report.items():
        print(f"  {k:6s} {v*1e3:9.3f} ms  {mb/v:9.1f} MB/s", file=sys.stderr)


if __name__ == "__main__":
    main()
