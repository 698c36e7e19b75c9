"""Micro-benchmark: isolate rle_encode's cost components on the TPU.

Variants:
  emissions  - the closed-form emission formula only (cummax + compares)
  cumsum     - offsets from emissions
  scatter    - the two .at[].set(mode=drop) compaction scatters (current)
  scatter_u  - same with unique_indices=True (per-position unique dump idx)
  gather     - searchsorted-based gather compaction (scatter-free)
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
from profile_stages import device_time


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

    def emis(x, l):
        el, ec, cv = jax.vmap(_emissions)(x, l)
        return el.astype(jnp.int32) + ec.astype(jnp.int32) + cv.astype(jnp.int32)

    if on("emissions"):
        device_time(emis, (chunks, lens), label="emissions")

    def offsets(x, l):
        el, ec, cv = jax.vmap(_emissions)(x, l)
        per = el.astype(jnp.int32) + ec.astype(jnp.int32)
        off = jnp.cumsum(per, axis=1) - per
        return off + cv.astype(jnp.int32)

    if on("cumsum"):
        device_time(offsets, (chunks, lens), label="emissions+cumsum")

    def scatter_cur(x, l):
        def one(xr, lr):
            el, ec, cv = _emissions(xr, lr)
            per = el.astype(jnp.int32) + ec.astype(jnp.int32)
            off = jnp.cumsum(per) - per
            out = jnp.zeros((cap,), jnp.uint8)
            dump = jnp.int32(cap)
            li = jnp.where(el, off, dump)
            ci = jnp.where(ec, off + el.astype(jnp.int32), dump)
            out = out.at[li].set(xr, mode="drop")
            out = out.at[ci].set(cv, mode="drop")
            return out
        return jax.vmap(one)(x, l)

    if on("scatter"):
        device_time(scatter_cur, (chunks, lens), label="scatter (current)")

    def scatter_uniq(x, l):
        def one(xr, lr):
            el, ec, cv = _emissions(xr, lr)
            per = el.astype(jnp.int32) + ec.astype(jnp.int32)
            off = jnp.cumsum(per) - per
            out = jnp.zeros((cap,), jnp.uint8)
            i = jnp.arange(cs, dtype=jnp.int32)
            li = jnp.where(el, off, cap + i)
            ci = jnp.where(ec, off + el.astype(jnp.int32), cap + cs + i)
            out = out.at[li].set(xr, mode="drop", unique_indices=True)
            out = out.at[ci].set(cv, mode="drop", unique_indices=True)
            return out
        return jax.vmap(one)(x, l)

    if on("scatter_u"):
        device_time(scatter_uniq, (chunks, lens), label="scatter unique")

    def scatter_sorted(x, l):
        # one combined scatter, 2 slots per position -> sorted AND unique:
        # slot j = 2i + {0,1}; idx = emitted ? off : OOB, with OOB kept
        # ascending (cap + slot) so the full index vector stays sorted
        def one(xr, lr):
            el, ec, cv = _emissions(xr, lr)
            eli = el.astype(jnp.int32)
            per = eli + ec.astype(jnp.int32)
            off = jnp.cumsum(per) - per
            slot = jnp.arange(2 * cs, dtype=jnp.int32)
            i = slot >> 1
            first = (slot & 1) == 0
            offi = off[i]
            emit = jnp.where(first, el[i], ec[i])
            idx = jnp.where(emit, offi + jnp.where(first, 0, eli[i]),
                            cap + slot)
            val = jnp.where(first, xr[i], cv[i])
            out = jnp.zeros((cap,), jnp.uint8)
            return out.at[idx].set(val, mode="drop", unique_indices=True,
                                   indices_are_sorted=True)
        return jax.vmap(one)(x, l)

    if on("scatter_s"):
        device_time(scatter_sorted, (chunks, lens), label="scatter sorted")

    def gather_comp(x, l):
        def one(xr, lr):
            el, ec, cv = _emissions(xr, lr)
            eli = el.astype(jnp.int32)
            per = eli + ec.astype(jnp.int32)
            off = jnp.cumsum(per) - per
            j = jnp.arange(cap, dtype=jnp.int32)
            src = jnp.searchsorted(off, j, side="right").astype(jnp.int32) - 1
            srcc = jnp.clip(src, 0, cs - 1)
            local = j - off[srcc]
            lit = (local == 0) & el[srcc]
            return jnp.where(lit, xr[srcc], cv[srcc])
        return jax.vmap(one)(x, l)

    if on("gather"):
        device_time(gather_comp, (chunks, lens), label="gather searchsorted")


if __name__ == "__main__":
    main()
