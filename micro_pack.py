"""Micro-benchmark #2: sort-based compaction, table gathers, pack cost.

Decides the zero-scatter encode architecture:
  sortcomp   - lax.sort as RLE compaction (key = off<<8 | byte)
  sortcomp32 - same but pure i32 sort of packed pairs
  tgather    - take_along_axis code lookup from a 256-entry table
  wgather    - decode-style gather: (C, L) rows gathering from (C, W) words
  packnew    - current pack_codes (shift-OR + unique scatter), compacted in
  packsort   - shift-OR run merge + sort-compaction of run ends (no scatter)
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from huffman_codec_tpu.ops.rle import _emissions, rle_max_encoded_len
from huffman_codec_tpu.ops.pack import _code_windows, pack_codes
from huffman_codec_tpu.utils.profiling import device_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-size", type=int, default=1 << 16)
    ap.add_argument("--n-chunks", type=int, default=256)
    ap.add_argument("--variants", default="all")
    args = ap.parse_args()
    cs, C = args.chunk_size, args.n_chunks
    n = cs * C
    mb = n / 1e6
    cap = rle_max_encoded_len(cs)
    want = (None if args.variants == "all"
            else set(args.variants.split(",")))

    def on(k):
        return want is None or k in want

    raw = open("/root/reference/data/hd01.raw", "rb").read()
    reps = -(-n // len(raw))
    data_np = np.frombuffer((raw * reps)[:n], np.uint8)
    chunks = jax.device_put(jnp.asarray(data_np.reshape(C, cs)))
    lens = jnp.full((C,), cs, jnp.int32)
    _ = np.asarray(chunks[0, :1])
    print(f"C={C} cs={cs} = {mb:.1f} MB platform="
          f"{jax.devices()[0].platform}", file=sys.stderr, flush=True)

    def sortcomp(x, l):
        def one(xr, lr):
            el, ec, cv = _emissions(xr, lr)
            eli = el.astype(jnp.int32)
            per = eli + ec.astype(jnp.int32)
            off = jnp.cumsum(per) - per
            # slot 2i = literal, 2i+1 = count byte; key packs target offset
            # (high bits) so ascending sort IS the compaction
            slot = jnp.arange(2 * cs, dtype=jnp.int32)
            i = slot >> 1
            first = (slot & 1) == 0
            emit = jnp.where(first, el[i], ec[i])
            tgt = off[i] + jnp.where(first, 0, eli[i])
            val = jnp.where(first, xr[i], cv[i]).astype(jnp.int32)
            key = jnp.where(emit, (tgt << 8) | val, jnp.int32(0x7FFFFFFF))
            skey = jax.lax.sort(key)
            return (skey[:cap] & 255).astype(jnp.uint8)
        return jax.vmap(one)(x, l)

    if on("sortcomp"):
        device_time(sortcomp, (chunks, lens), reps_hi=5, label="sort compaction")

    # correctness probe vs the scatter encoder
    from huffman_codec_tpu.ops.rle import rle_encode
    small = chunks[:2, :]
    got = np.asarray(jax.jit(sortcomp)(small, lens[:2]))
    want_out = np.asarray(jax.jit(jax.vmap(
        lambda x, l: rle_encode(x, l, out_len=cap)[0]))(small, lens[:2]))
    tot = np.asarray(jax.jit(jax.vmap(
        lambda x, l: rle_encode(x, l, out_len=cap)[1]))(small, lens[:2]))
    for c in range(2):
        t = int(tot[c])
        assert (got[c][:t] == want_out[c][:t]).all(), "sortcomp mismatch"
    print("sortcomp correctness OK", file=sys.stderr, flush=True)

    streams, slens = jax.jit(jax.vmap(
        lambda x, l: rle_encode(x, l, out_len=cap)))(chunks, lens)
    sym = streams.astype(jnp.int32)

    if on("tgather"):
        table = jnp.arange(256, dtype=jnp.int32) * 7
        def tg(s, t):
            return jnp.take_along_axis(
                jnp.broadcast_to(t[None, :], (s.shape[0], 256)), s, axis=1)
        device_time(tg, (sym, table), reps_hi=5, label="table gather 256")

    if on("wgather"):
        W = cap // 4
        words = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 31, (C, W), np.int64),
            jnp.int32)
        idx = jnp.asarray(
            np.random.default_rng(1).integers(0, W, (C, 512), np.int64),
            jnp.int32)
        def wg(w, i):
            out = w
            for _ in range(4):  # 4 dependent rounds, like 4 decode steps
                g = jnp.take_along_axis(out[:, :W], i, axis=1)  # (C, 512)
                i2 = (i + g) % W
                g2 = jnp.take_along_axis(out[:, :W], i2, axis=1)
                out = jnp.concatenate([g + g2, out[:, 512:]], axis=1)
            return out[:, :512]
        device_time(wg, (words, idx), reps_hi=5, label="word gather x8 (C,512)")

    lens_per = jnp.minimum((sym & 7) + 1, 31)  # fake code lens 1..8
    codes_per = (sym & ((1 << 8) - 1)).astype(jnp.uint32)
    idxv = jnp.arange(cap, dtype=jnp.int32)[None, :]
    lens_per = jnp.where(idxv < slens[:, None], lens_per, 0)
    n_words = cap + 2

    if on("packnew"):
        def pk(lo, ln):
            f = jax.vmap(lambda a, b: pack_codes(
                a, jnp.zeros_like(a), b, n_words, max_len=32))
            return f(lo, ln)
        device_time(pk, (codes_per, lens_per), reps_hi=5,
                    label="pack shiftOR+scatter")

    if on("packsort"):
        def pks(lo, ln):
            def one(lo1, ln1):
                win, w0, total = _code_windows(
                    lo1, jnp.zeros_like(lo1), ln1, 32)
                nsym = ln1.shape[0]
                i32 = jnp.arange(nsym, dtype=jnp.int32)
                out = jnp.zeros((n_words,), jnp.uint32)
                for j in range(2):
                    idx = jnp.where(ln1 > 0, w0 + j, n_words + i32)
                    acc = win[:, j]
                    for d in (1, 2, 4, 8, 16, 32, 64):
                        prev = jnp.concatenate(
                            [jnp.zeros((d,), acc.dtype), acc[:-d]])
                        pidx = jnp.concatenate(
                            [jnp.full((d,), -1, idx.dtype), idx[:-d]])
                        acc = jnp.where(pidx == idx, acc | prev, acc)
                    ends = jnp.concatenate(
                        [idx[1:] != idx[:-1], jnp.ones((1,), bool)])
                    # canonical codes <= 31 bits -> column-j run-end targets
                    # are the CONSECUTIVE words [j, used+j): compaction in
                    # symbol order == placement. One 2-operand sort.
                    key = jnp.where(ends & (idx < n_words), i32,
                                    jnp.int32(1 << 30))
                    _, v = jax.lax.sort((key, acc), num_keys=1)
                    col = jnp.zeros((n_words,), jnp.uint32)
                    col = jax.lax.dynamic_update_slice(
                        col, v[:n_words - j], (jnp.int32(j),))
                    out = out | col
                return out, total
            return jax.vmap(one)(lo, ln)
        device_time(pks, (codes_per, lens_per), reps_hi=5,
                    label="pack shiftOR+sort")
        # correctness vs pack_codes
        a = jax.jit(lambda l, n_: jax.vmap(lambda x, y: pack_codes(
            x, jnp.zeros_like(x), y, n_words, max_len=32))(l, n_))(
                codes_per[:2], lens_per[:2])
        b = jax.jit(pks)(codes_per[:2], lens_per[:2])
        assert (np.asarray(a[0]) == np.asarray(b[0])).all(), "packsort wrong"
        print("packsort correctness OK", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
