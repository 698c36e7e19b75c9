"""Benchmark harness — prints ONE JSON line for the driver.

Measures the flagship v3 *sharded streaming* pipeline (per-chunk diff ->
vectorized RLE -> chunk-parallel canonical Huffman -> bit pack, all inside
one jit) on the default JAX platform (the real TPU chip under the driver).

Compile cost is input-size-INDEPENDENT: the encoder is one fixed
(step_chunks x chunk_size) grid kernel; arbitrary inputs stream through it
(models/chunked.py:_encode_sharded_stage). The XLA compilation cache lives
in the repo (.jax_cache/) so driver runs hit a warm cache.

The headline metric is steady-state device encode throughput over a >=16 MB
input (median of --runs full streaming passes, inputs device-resident, one
tail sync — the tunnel's ~26 ms round-trip amortizes across steps). Decode
throughput, bpc, the stage breakdown, and a Pallas-on-TPU smoke result are
in the detail block.

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

REPO = pathlib.Path(__file__).resolve().parent
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

DATA = pathlib.Path("/root/reference/data")
BASELINE_ENCODE_MBPS = 0.67  # reference hd01.raw -m encode (BASELINE.md §C)

t_start = time.perf_counter()


def note(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - t_start:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _load_input(spec: str, min_bytes: int) -> tuple[bytes, str]:
    if spec == "corpus":
        files = sorted(DATA.glob("*.raw"))
        raw = b"".join(f.read_bytes() for f in files)
        reps = -(-min_bytes // len(raw))
        return raw * reps, f"corpus-concat-x{reps}"
    p = pathlib.Path(spec)
    return p.read_bytes(), p.name


def _pallas_smoke() -> str:
    """Run the Pallas histogram on the real chip with a tiny shape; report
    ok|fallback — a Mosaic regression must not silently hang the bench."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return "skipped-cpu"
    try:
        from huffman_codec_tpu.ops.pallas_kernels import histogram256

        x = jnp.tile(jnp.arange(256, dtype=jnp.uint8), 4)[None, :]
        out = np.asarray(histogram256(x, jnp.array([1024], jnp.int32)))
        assert (out == 4).all(), "pallas histogram wrong result"
        return "ok"
    except Exception as e:  # noqa: BLE001 — record and fall back
        os.environ["HCTPU_PALLAS"] = "0"
        return f"fallback ({type(e).__name__})"


def _stage_breakdown(step_dev, S: int, cs: int, lane: int) -> dict:
    """Per-stage device times (ms) on the bench grid, via the two-point
    chained-fori method (utils/profiling.device_time) that cancels the
    tunnel's dispatch+fetch latency."""
    import jax
    import jax.numpy as jnp

    from huffman_codec_tpu.models.chunked import _sharded_cap
    from huffman_codec_tpu.ops.canonical import (
        assign_codes, build_lengths, canonical_encode_batch, histogram)
    from huffman_codec_tpu.ops.rle import rle_encode
    from huffman_codec_tpu.utils.profiling import device_time

    cap = _sharded_cap(cs, "canonical", lane)
    chunks = step_dev.reshape(S, cs)
    full = jnp.full((S,), cs, jnp.int32)
    out = {}
    renc = jax.vmap(lambda x, l: rle_encode(x, l, out_len=cap))
    out["rle_encode"] = device_time(renc, (chunks, full), reps_hi=5,
                                    label="rle_encode", quiet=True)
    streams, slens = jax.jit(renc)(chunks, full)
    slens = slens.astype(jnp.int32)
    out["histogram"] = device_time(histogram, (streams, slens), reps_hi=5,
                                   label="histogram", quiet=True)
    counts = jax.jit(histogram)(streams, slens)
    out["build_lengths"] = device_time(build_lengths, (counts,), reps_hi=5,
                                       label="build_lengths", quiet=True)
    lens_t = jax.jit(build_lengths)(counts)
    out["assign_codes"] = device_time(assign_codes, (lens_t,), reps_hi=5,
                                      label="assign_codes", quiet=True)
    out["entropy_total"] = device_time(
        lambda s, l: canonical_encode_batch(s, l, lane=lane),
        (streams, slens), reps_hi=5, label="entropy_total", quiet=True)
    out["gather_pack"] = (out["entropy_total"] - out["histogram"]
                          - out["build_lengths"] - out["assign_codes"])
    return {k: round(v * 1e3, 3) for k, v in out.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default="corpus",
                    help="input path, or 'corpus' for the reference corpus "
                         "repeated to --min-bytes")
    ap.add_argument("--min-bytes", type=int, default=1 << 24)
    ap.add_argument("--chunk-size", type=int, default=1 << 16)
    ap.add_argument("--step-chunks", type=int, default=256,
                    help="chunks per fixed-grid step (the one compiled shape)")
    ap.add_argument("--entropy", default="canonical",
                    choices=["canonical", "fgk"])
    ap.add_argument("--lane", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--skip-decode", action="store_true")
    ap.add_argument("--skip-stages", action="store_true",
                    help="skip the per-stage device breakdown")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huffman_codec_tpu.models import CodecConfig, TPUCodec
    from huffman_codec_tpu.models.chunked import _encode_sharded_stage

    detail: dict = {"platform": jax.devices()[0].platform}
    detail["pallas"] = _pallas_smoke()
    note(f"devices={jax.devices()}  pallas={detail['pallas']}")

    raw, name = _load_input(args.file, args.min_bytes)
    cs, S = args.chunk_size, args.step_chunks
    step_bytes = S * cs
    n_steps = max(1, len(raw) // step_bytes)
    n = n_steps * step_bytes  # whole steps only for the timing loop
    note(f"input {name}: {n} bytes = {n_steps} steps x {S} chunks x {cs} B")

    # stage all steps on device once; the timing loop then measures pure
    # device throughput of the fixed-grid kernel (the serving steady state)
    arr = np.frombuffer(raw[:n], np.uint8)
    steps = [jax.device_put(jnp.asarray(arr[k * step_bytes:(k + 1) * step_bytes]))
             for k in range(n_steps)]
    carries = [np.uint8(0)] + [arr[k * step_bytes - 1]
                               for k in range(1, n_steps)]
    jax.block_until_ready(steps)
    note("input on device")

    def stream_pass():
        outs = [_encode_sharded_stage(steps[k], jnp.int32(step_bytes),
                                      carries[k], True, cs, S,
                                      args.entropy, args.lane)
                for k in range(n_steps)]
        # tail sync: one tiny fetch forces the whole in-order device queue
        jax.block_until_ready(outs[-1][1])
        return outs

    t0 = time.perf_counter()
    stream_pass()
    note(f"fixed-grid encode compiled + first pass done "
         f"({time.perf_counter() - t0:.1f}s)")
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        stream_pass()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    mbps = n / dt / 1e6
    note(f"encode timed: median {dt:.4f}s = {mbps:.1f} MB/s")
    detail.update(file=name, bytes=n, chunk_size=cs, step_chunks=S,
                  entropy=args.entropy, median_s=round(dt, 4))

    # provisional result now — anything after this only ADDS detail
    result = {
        "metric": "v3_device_encode_throughput",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_ENCODE_MBPS, 2),
        "detail": detail,
    }

    if not args.skip_stages:
        try:
            detail["stage_ms"] = _stage_breakdown(steps[0], S, cs, args.lane)
            note(f"stage breakdown: {detail['stage_ms']}")
        except Exception as e:  # noqa: BLE001 — breakdown is best-effort
            detail["stage_ms"] = f"failed: {type(e).__name__}"
            note(f"stage breakdown failed: {e!r}")

    try:
        codec = TPUCodec(CodecConfig(
            use_diff=True, chunk_size=cs, entropy=args.entropy,
            lane=args.lane, layout="sharded", step_chunks=S))
        blob = codec.encode(raw[:n])
        detail["bpc"] = round(8 * len(blob) / n, 3)
        note(f"container encode done: {len(blob)} bytes "
             f"({detail['bpc']} bpc)")
        if not args.skip_decode:
            t0 = time.perf_counter()
            out = codec.decode(blob)
            note(f"decode compiled + first run ({time.perf_counter()-t0:.1f}s)")
            assert out == raw[:n], "roundtrip failed"
            dts = []
            for _ in range(max(1, args.runs - 2)):
                t0 = time.perf_counter()
                codec.decode(blob)
                dts.append(time.perf_counter() - t0)
            ddt = sorted(dts)[len(dts) // 2]
            detail["decode_mbps"] = round(n / ddt / 1e6, 3)
            note(f"decode timed: median {ddt:.4f}s = "
                 f"{detail['decode_mbps']} MB/s (host loop incl. "
                 f"container parse)")
    except Exception as e:  # noqa: BLE001 — keep the encode number
        detail["container_error"] = f"{type(e).__name__}: {e}"
        note(f"container/decode phase failed: {e!r}")

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
