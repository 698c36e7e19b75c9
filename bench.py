"""Benchmark harness — prints ONE JSON line for the driver.

Measures the flagship v3 device pipeline (diff -> vectorized RLE ->
chunk-parallel canonical Huffman -> bit pack, all inside one jit) on the
default JAX platform (the real TPU chip under the driver), steady-state
(post-compile), median of --runs executions. Decode throughput and the
compression ratio are reported in the detail block.

vs_baseline compares against the upstream C++ binary's measured encode
throughput on this machine (BASELINE.md §C: hd01.raw with the diff model
= 0.67 MB/s — the reference is 0.1-1 MB/s across the corpus).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the codec's kernels take minutes to
# compile through the remote-TPU tunnel; cache them across bench runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hctpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

DATA = pathlib.Path("/root/reference/data")
BASELINE_ENCODE_MBPS = 0.67  # reference hd01.raw -m encode (BASELINE.md §C)


def _load_input(spec: str) -> tuple[bytes, str]:
    if spec == "corpus":
        files = sorted(DATA.glob("*.raw"))
        return b"".join(f.read_bytes() for f in files), "corpus-concat"
    p = pathlib.Path(spec)
    return p.read_bytes(), p.name


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default="corpus",
                    help="input path, or 'corpus' for the concatenated "
                         "reference corpus (~3.4 MB)")
    ap.add_argument("--chunk-size", type=int, default=1 << 16)
    ap.add_argument("--entropy", default="canonical",
                    choices=["canonical", "fgk"])
    ap.add_argument("--lane", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--skip-decode", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huffman_codec_tpu.models import CodecConfig, TPUCodec
    from huffman_codec_tpu.models.chunked import _encode_stream_stage
    from huffman_codec_tpu.ops.rle import rle_max_encoded_len

    t_start = time.perf_counter()

    def note(msg: str) -> None:
        print(f"[bench +{time.perf_counter() - t_start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    raw, name = _load_input(args.file)
    n = len(raw)
    cs = args.chunk_size
    max_chunks = -(-(rle_max_encoded_len(n) + 64) // cs)
    note(f"loaded {name} ({n} bytes); devices={jax.devices()}")
    data = jnp.asarray(np.frombuffer(raw, np.uint8))
    jax.block_until_ready(data)
    note("input on device")

    def run():
        out = _encode_stream_stage(data, True, cs, max_chunks,
                                   args.entropy, args.lane)
        jax.block_until_ready(out)
        return out

    run()  # compile
    note("encode compiled + first run done")
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    mbps = n / dt / 1e6
    note(f"encode timed: median {dt:.4f}s = {mbps:.1f} MB/s")

    detail = {
        "file": name,
        "bytes": n,
        "chunk_size": cs,
        "entropy": args.entropy,
        "median_s": round(dt, 4),
        "platform": jax.devices()[0].platform,
    }

    codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=cs,
                                 entropy=args.entropy, lane=args.lane))
    blob = codec.encode(raw)
    detail["bpc"] = round(8 * len(blob) / n, 3)
    note(f"container encode done: {len(blob)} bytes "
         f"({detail['bpc']} bpc)")
    if not args.skip_decode:
        assert codec.decode(blob) == raw, "roundtrip failed"
        note("decode compiled + roundtrip verified")
        dts = []
        for _ in range(max(1, args.runs - 2)):
            t0 = time.perf_counter()
            codec.decode(blob)
            dts.append(time.perf_counter() - t0)
        detail["decode_mbps"] = round(n / sorted(dts)[len(dts) // 2] / 1e6, 3)

    print(json.dumps({
        "metric": "v3_device_encode_throughput",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_ENCODE_MBPS, 2),
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
