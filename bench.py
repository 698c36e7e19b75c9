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
    if jax.default_backend() != "cpu" and cs % 128 == 0 and cap % 128 == 0:
        from huffman_codec_tpu.ops.pallas_kernels import rle_diff_encode_fused

        zc = jnp.zeros((S,), jnp.uint8)
        renc = lambda x, l: rle_diff_encode_fused(x, l, zc, True, cap)
        out["rle_encode"] = device_time(renc, (chunks, full), reps_hi=5,
                                        label="rle_encode(fused)",
                                        quiet=True)
    else:
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


def _adaptive_probe() -> dict:
    """One adaptive-mode TPU number (the reference's headline feature,
    transform.cpp:294-328): hd01.raw through the full `-a -m` path —
    auto block-size search + tiled encode + best-of-two container (the
    SIZE-WINNING whole_file profile; since r4 it is also the fast one) —
    WARM encode/decode wall times + size vs the reference's 87901 B.
    Warm = steady-state serving; the first call pays one-time XLA
    compiles (reported separately). The warm wall floor here is ~3
    tunnel round-trips (~28 ms each on this rig), not device work."""
    import time as _t

    from huffman_codec_tpu.models import CodecConfig, TPUCodec

    def timed(fn):
        t0 = _t.perf_counter()
        fn()
        return _t.perf_counter() - t0

    raw = (DATA / "hd01.raw").read_bytes()
    codec = TPUCodec(CodecConfig(use_diff=True, use_adapt=True, width=512,
                                 chunk_size=1 << 16))
    t0 = _t.perf_counter()
    blob = codec.encode(raw)  # compiles: 8 bs candidates + 2 containers
    compile_enc = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    out = codec.decode(blob)
    compile_dec = _t.perf_counter() - t0
    assert out == raw, "adaptive roundtrip failed"
    enc_s = min(timed(lambda: codec.encode(raw)) for _ in range(3))
    dec_s = min(timed(lambda: codec.decode(blob)) for _ in range(3))
    dev_ms, rt_ms = _adaptive_device_ms(codec, raw)
    return {"file": "hd01.raw", "encode_s": round(enc_s, 3),
            "encode_mbps": round(len(raw) / enc_s / 1e6, 2),
            "decode_s": round(dec_s, 3),
            "decode_mbps": round(len(raw) / dec_s / 1e6, 2),
            "bytes": len(blob),
            "bpc": round(8 * len(blob) / len(raw), 3), "ref_bytes": 87901,
            "ref_encode_s": 0.51, "ref_decode_s": 0.26,
            # the warm-latency accounting (VERDICT r4 weak #4): encode_s
            # should be ~device_ms + ~3 tunnel round-trips (search sync,
            # dispatch wave, payload fetch) — both terms now measured
            "device_ms": dev_ms, "tunnel_rt_ms": rt_ms,
            "compile_s": {"encode": round(compile_enc, 1),
                          "decode": round(compile_dec, 1)}}


def _adaptive_device_ms(codec, raw) -> tuple[float, float]:
    """Measured DEVICE time of one warm hd01 `-a -m` encode (score wave +
    both best-of-two container stages) and the tunnel round-trip: chain M
    dispatch waves with one sync and difference two M values — the slope
    is pure device work, the RT cancels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from huffman_codec_tpu.ops.adapt import (_adapt_score_v3,
                                             candidate_sizes)
    from huffman_codec_tpu.ops.diff import diff_apply

    x0 = jnp.asarray(np.frombuffer(raw, np.uint8))
    sx = jax.block_until_ready(diff_apply(x0))
    cands = candidate_sizes(512, len(raw) // 512)
    scores = [_adapt_score_v3(sx, 512, 512, b) for b in cands]
    bs = cands[int(np.argmin([int(s) for s in scores]))]

    def wave_scores(m):
        t0 = time.perf_counter()
        last = None
        for _ in range(m):
            for b in cands:
                last = _adapt_score_v3(sx, 512, 512, b)
        int(last)
        return time.perf_counter() - t0

    def wave_stages(m):
        t0 = time.perf_counter()
        st = None
        for _ in range(m):
            st = (codec._dispatch_global(raw, bs, whole=True),
                  codec._dispatch_global(raw, bs, whole=False))
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, st)
        return time.perf_counter() - t0

    wave_scores(1), wave_stages(1)  # warm the dispatch path
    sc = (min(wave_scores(9) for _ in range(2))
          - min(wave_scores(1) for _ in range(2))) / 8
    stg = (min(wave_stages(9) for _ in range(2))
           - min(wave_stages(1) for _ in range(2))) / 8
    # tunnel round-trip: warm scalar dispatch + fetch
    z = jax.jit(lambda v: v + 1)
    int(z(jnp.int32(1)))
    rt = min(timed_once(lambda: int(z(jnp.int32(1)))) for _ in range(5))
    return round((sc + stg) * 1e3, 1), round(rt * 1e3, 1)


def timed_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _adaptive_stream_probe() -> dict:
    """Adaptive mode AT SCALE (the capability the reference lacks —
    transform.cpp's adaptive path is whole-matrix serial): a 16 MiB
    matrix through the sharded-adaptive layout. Reports the device
    transform+entropy stage throughput (the serving number) and the
    end-to-end wall (tunnel-capped: the 5.6 MB high-entropy payload
    fetch alone is ~250 ms on this rig)."""
    import time as _t

    import jax.numpy as jnp

    from huffman_codec_tpu.models import CodecConfig, TPUCodec
    from huffman_codec_tpu.models.chunked import (
        _encode_sharded_adapt_stage, _sharded_cap)
    from huffman_codec_tpu.utils.profiling import device_time

    raw = (DATA / "hd01.raw").read_bytes() * 64  # 16 MiB
    codec = TPUCodec(CodecConfig(use_diff=True, use_adapt=True, width=512,
                                 chunk_size=1 << 16, layout="sharded",
                                 lane=512))
    blob = codec.encode(raw)
    assert codec.decode(blob) == raw, "sharded-adaptive roundtrip failed"
    e2e = None
    for _ in range(3):  # best-of-3: the first post-compile pass still
        t0 = _t.perf_counter()  # pays one-time staging on this rig
        blob = codec.encode(raw)
        dt = _t.perf_counter() - t0
        e2e = dt if e2e is None else min(e2e, dt)
    arr = np.frombuffer(raw, np.uint8)
    bands = arr.reshape(256, 65536)
    car = np.zeros((256,), np.uint8)
    car[1:] = bands[:-1, -1]
    cap = _sharded_cap(1 << 16, "canonical", 512)
    hdr = codec._parse(blob)
    d = device_time(
        lambda b, c: _encode_sharded_adapt_stage(
            b, c, True, 512, 128, int(hdr["bs"]), cap, "canonical", 512),
        (jnp.asarray(bands), jnp.asarray(car)), reps_hi=3, quiet=True)
    return {"file": "hd01.raw x64 (16 MiB)", "bytes": len(blob),
            "bpc": round(8 * len(blob) / len(raw), 3),
            "device_stage_mbps": round(len(raw) / d / 1e6, 1),
            "e2e_mbps": round(len(raw) / e2e / 1e6, 1)}


def _decode_breakdown(codec, blob, S: int, cs: int, lane: int) -> dict:
    """Decode-side stage times: host parse, vectorized word loader, H2D
    transfer, the entropy kernel, and the RLE+diff tail (device ms)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from huffman_codec_tpu.models.chunked import (
        _decode_sharded_tail, _entropy_decode, _sharded_cap)
    from huffman_codec_tpu.utils.profiling import device_time

    from huffman_codec_tpu.models.chunked import _repad_words

    out = {}
    t0 = _time.perf_counter()
    hdr = codec._parse(blob)
    out["parse"] = _time.perf_counter() - t0
    rl = hdr["rle_lens"][:S].astype(np.int32)
    car = hdr["carries"][:S]
    sub = dict(hdr)
    sub["tables"] = hdr["tables"][:S]
    sub["lane_words"] = hdr["lane_words"][:S]
    cap = _sharded_cap(cs, "canonical", lane)
    nl = cap // lane
    use_k = codec._use_pallas_repad(hdr)
    t0 = _time.perf_counter()
    if use_k:
        d2, aoff, wc, lwd = codec._stage_words_aligned(blob, hdr, 0, S, S)
        rld = jax.device_put(jnp.asarray(rl))
        card = jax.device_put(jnp.asarray(car))
        jax.block_until_ready((d2, lwd, rld, card))
    else:
        fd, lwd = codec._stage_words(blob, hdr, 0, S, S)
        rld = jax.device_put(jnp.asarray(rl))
        card = jax.device_put(jnp.asarray(car))
        jax.block_until_ready((fd, lwd, rld, card))
    out["stage_h2d"] = _time.perf_counter() - t0
    if use_k:
        from huffman_codec_tpu.ops.pallas_kernels import repad_words

        out["repad"] = device_time(
            lambda a, b, c_, d: repad_words(a, b, c_, d, nl,
                                            hdr["wl_bucket"]),
            (d2, aoff, wc, lwd), reps_hi=4, label="repad", quiet=True)
        wd = repad_words(d2, aoff, wc, lwd, nl, hdr["wl_bucket"])
    else:
        out["repad"] = device_time(
            lambda f_, l_: _repad_words(f_, l_, nl, hdr["wl_bucket"]),
            (fd, lwd), reps_hi=4, label="repad", quiet=True)
        wd = _repad_words(fd, lwd, nl, hdr["wl_bucket"])
    out["entropy_decode"] = device_time(
        lambda w_, r_: _entropy_decode(w_, r_, sub, cap), (wd, rld),
        reps_hi=4, label="entropy_decode", quiet=True)
    chunks_rle = jax.jit(
        lambda w_, r_: _entropy_decode(w_, r_, sub, cap))(wd, rld)
    out["rle_diff_tail"] = device_time(
        lambda c_, r_, k_: _decode_sharded_tail(c_, r_, k_, cs, cap, True),
        (chunks_rle, rld, card), reps_hi=4, label="rle_diff_tail",
        quiet=True)
    # device-resident decode throughput: the kernel path alone, the
    # number comparable to the headline device encode (end-to-end is
    # capped by the tunnel's ~30-45 MB/s high-entropy transfer path)
    dev_s = out["repad"] + out["entropy_decode"] + out["rle_diff_tail"]
    out["device_decode_mbps"] = (S * cs) / dev_s / 1e6
    return {k: round(v * 1e3, 3) if not k.endswith("mbps") else round(v, 1)
            for k, v in out.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default="corpus",
                    help="input path, or 'corpus' for the reference corpus "
                         "repeated to --min-bytes")
    ap.add_argument("--min-bytes", type=int, default=1 << 26,
                    help="64 MiB default: >= 4 fixed-grid steps, so the "
                         "tunnel's ~26 ms dispatch round-trip amortizes")
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
    ap.add_argument("--budget-seconds", type=float, default=900.0,
                    help="skip remaining optional probes once elapsed "
                         "wall time exceeds this (cold-compile insurance: "
                         "the headline JSON must always be printed)")
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

    # provisional result now — anything after this only ADDS detail.
    # Also snapshotted to a file so a driver timeout on a cold-compile
    # run still leaves the headline number on disk.
    result = {
        "metric": "v3_device_encode_throughput",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_ENCODE_MBPS, 2),
        "detail": detail,
    }
    try:
        (REPO / "bench_provisional.json").write_text(json.dumps(result))
    except OSError:
        pass

    if not args.skip_stages:
        try:
            detail["stage_ms"] = _stage_breakdown(steps[0], S, cs, args.lane)
            note(f"stage breakdown: {detail['stage_ms']}")
        except Exception as e:  # noqa: BLE001 — breakdown is best-effort
            detail["stage_ms"] = f"failed: {type(e).__name__}"
            note(f"stage breakdown failed: {e!r}")

    # streaming-overlap proof (SURVEY §2.8 PP): the same fixed-grid step,
    # >= 4 steps (~64 MB of work), async pipelined dispatch vs a forced
    # block_until_ready between steps. Reuses the resident step arrays so
    # no extra input is staged; measures dispatch/compute overlap.
    if not args.skip_stages:
        try:
            ksteps = (steps * 4)[: max(4, n_steps)]

            def over_pass(sync_each: bool) -> float:
                t0 = time.perf_counter()
                outs = []
                for st in ksteps:
                    o = _encode_sharded_stage(
                        st, jnp.int32(step_bytes), np.uint8(0), True, cs, S,
                        args.entropy, args.lane)
                    if sync_each:
                        jax.block_until_ready(o[1])
                    outs.append(o)
                jax.block_until_ready(outs[-1][1])
                return time.perf_counter() - t0

            over_pass(False)  # warm
            t_async = min(over_pass(False) for _ in range(3))
            t_serial = min(over_pass(True) for _ in range(3))
            detail["overlap"] = {
                "steps": len(ksteps),
                "mb": round(len(ksteps) * step_bytes / 1e6, 1),
                "async_s": round(t_async, 4), "serial_s": round(t_serial, 4),
                "speedup": round(t_serial / t_async, 3),
            }
            note(f"streaming overlap: {detail['overlap']}")
        except Exception as e:  # noqa: BLE001
            detail["overlap"] = f"failed: {type(e).__name__}"
            note(f"overlap check failed: {e!r}")

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
            # headline decode, SYMMETRIC with the encode metric: payload
            # staged on device (as encode's raw input is), device decode
            # + repad + entropy + RLE/diff tail, one tail sync, outputs
            # device-resident (the serving shape: downstream consumers
            # are on device too). The transfer-included figures are
            # capped by this rig's dev tunnel, whose compressed
            # transport moves the HIGH-ENTROPY payload at ~30-45 MB/s
            # each way (raw corpus bytes move at 1.4 GB/s; a real TPU
            # host's PCIe does not have this cliff) — reported
            # separately as decode_h2d_mbps / decode_e2e_mbps.
            hdr_d, staged = codec.stage_decode_steps(blob)
            parts = codec.run_decode_steps(hdr_d, staged)
            jax.block_until_ready(parts)
            dts = []
            for _ in range(max(1, args.runs - 2)):
                t0 = time.perf_counter()
                parts = codec.run_decode_steps(hdr_d, staged)
                jax.block_until_ready(parts)
                dts.append(time.perf_counter() - t0)
            ddt = sorted(dts)[len(dts) // 2]
            detail["decode_mbps"] = round(n / ddt / 1e6, 3)
            note(f"decode timed: median {ddt:.4f}s = "
                 f"{detail['decode_mbps']} MB/s (device decode, payload "
                 f"staged, outputs device-resident)")
            dts = []
            for _ in range(max(1, args.runs - 2)):
                t0 = time.perf_counter()
                parts = codec.decode_steps(blob)
                jax.block_until_ready(parts[-1])
                dts.append(time.perf_counter() - t0)
            ddt = sorted(dts)[len(dts) // 2]
            detail["decode_h2d_mbps"] = round(n / ddt / 1e6, 3)
            note(f"decode incl. parse + payload H2D: median {ddt:.4f}s = "
                 f"{detail['decode_h2d_mbps']} MB/s (tunnel-capped)")
            dts = []
            for _ in range(max(1, args.runs - 2)):
                t0 = time.perf_counter()
                codec.decode(blob)
                dts.append(time.perf_counter() - t0)
            ddt = sorted(dts)[len(dts) // 2]
            detail["decode_e2e_mbps"] = round(n / ddt / 1e6, 3)
            note(f"decode e2e (incl. D2H fetch + crc32): median {ddt:.4f}s "
                 f"= {detail['decode_e2e_mbps']} MB/s (tunnel-capped)")
            if not args.skip_stages:
                try:
                    detail["decode_stage_ms"] = _decode_breakdown(
                        codec, blob, S, cs, args.lane)
                    dd = detail["decode_stage_ms"].pop(
                        "device_decode_mbps", None)
                    if dd is not None:
                        detail["decode_device_mbps"] = dd
                    note(f"decode stages: {detail['decode_stage_ms']} "
                         f"device_decode={dd} MB/s")
                except Exception as e:  # noqa: BLE001 — best-effort
                    detail["decode_stage_ms"] = f"failed: {type(e).__name__}"
                    note(f"decode breakdown failed: {e!r}")
    except Exception as e:  # noqa: BLE001 — keep the encode number
        detail["container_error"] = f"{type(e).__name__}: {e}"
        note(f"container/decode phase failed: {e!r}")

    def over_budget() -> bool:
        if time.perf_counter() - t_start <= args.budget_seconds:
            return False
        note(f"budget {args.budget_seconds:.0f}s exceeded — skipping "
             f"remaining optional probes")
        return True

    if not args.skip_stages and not over_budget():
        try:
            detail["adaptive"] = _adaptive_probe()
            note(f"adaptive (-a -m) probe: {detail['adaptive']}")
        except Exception as e:  # noqa: BLE001 — best-effort
            detail["adaptive"] = f"failed: {type(e).__name__}"
            note(f"adaptive probe failed: {e!r}")
    if not args.skip_stages and not over_budget():
        try:
            detail["adaptive_stream"] = _adaptive_stream_probe()
            note(f"adaptive streaming probe: {detail['adaptive_stream']}")
        except Exception as e:  # noqa: BLE001 — best-effort
            detail["adaptive_stream"] = f"failed: {type(e).__name__}"
            note(f"adaptive streaming probe failed: {e!r}")

    # driver-visible summary of the weak axes (VERDICT r3 #8): encode,
    # decode and adaptive throughputs ride the parsed top level, not
    # just the detail blob
    result["decode_mbps"] = detail.get("decode_mbps")
    result["decode_e2e_mbps"] = detail.get("decode_e2e_mbps")
    if isinstance(detail.get("adaptive_stream"), dict):
        result["adaptive_stream_mbps"] = (
            detail["adaptive_stream"]["device_stage_mbps"])
    if isinstance(detail.get("adaptive"), dict):
        result["adaptive_encode_mbps"] = detail["adaptive"]["encode_mbps"]
        result["adaptive_decode_s"] = detail["adaptive"]["decode_s"]
        result["adaptive_bytes_vs_ref"] = (detail["adaptive"]["bytes"]
                                           - detail["adaptive"]["ref_bytes"])
    try:
        (REPO / "bench_provisional.json").write_text(json.dumps(result))
    except OSError:
        pass
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
