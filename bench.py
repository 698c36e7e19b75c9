"""Benchmark harness — prints ONE JSON line for the driver.

Measures the flagship v3 device encode pipeline (diff -> vectorized RLE ->
chunk-parallel FGK -> bit pack, all inside one jit) on the default JAX
platform (the real TPU chip under the driver; CPU elsewhere), steady-state
(post-compile), median of --runs executions.

vs_baseline compares against the upstream C++ binary's measured encode
throughput on the same file/config on this machine (BASELINE.md §C:
hd01.raw with the diff model = 0.67 MB/s).
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

REPO = pathlib.Path(__file__).resolve().parent
DATA = pathlib.Path("/root/reference/data")

BASELINE_ENCODE_MBPS = 0.67  # reference hd01.raw -m encode (BASELINE.md §C)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default=str(DATA / "hd01.raw"))
    ap.add_argument("--chunk-size", type=int, default=1 << 16)
    ap.add_argument("--entropy", default="canonical",
                    choices=["canonical", "fgk"])
    ap.add_argument("--lane", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--verify", action="store_true",
                    help="also round-trip the container on a small slice")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huffman_codec_tpu.models.chunked import _encode_stream_stage
    from huffman_codec_tpu.ops.rle import rle_max_encoded_len

    raw = pathlib.Path(args.file).read_bytes()
    n = len(raw)
    cs = args.chunk_size
    max_chunks = -(-(rle_max_encoded_len(n) + 64) // cs)

    data = jnp.asarray(np.frombuffer(raw, np.uint8))

    def run():
        out = _encode_stream_stage(data, True, cs, max_chunks,
                                   args.entropy, args.lane)
        jax.block_until_ready(out)
        return out

    run()  # compile
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    mbps = n / dt / 1e6

    if args.verify:
        from huffman_codec_tpu.models import CodecConfig, TPUCodec

        codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=cs,
                                     entropy=args.entropy, lane=args.lane))
        blob = codec.encode(raw[: 1 << 16])
        assert codec.decode(blob) == raw[: 1 << 16], "roundtrip failed"

    print(json.dumps({
        "metric": "v3_device_encode_throughput",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_ENCODE_MBPS, 2),
        "detail": {
            "file": pathlib.Path(args.file).name,
            "bytes": n,
            "chunk_size": cs,
            "entropy": args.entropy,
            "median_s": round(dt, 4),
            "platform": jax.devices()[0].platform,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
