"""v3 sharded layout: per-chunk transforms, random-access decode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from huffman_codec_tpu.models import CodecConfig, TPUCodec  # noqa: E402

RNG = np.random.default_rng(41)


def _data(n=3000):
    out = np.empty(n, np.uint8)
    out[: n // 2] = (np.arange(n // 2) // 7).astype(np.uint8)  # smooth ramp
    out[n // 2 :] = RNG.integers(0, 32, n - n // 2, dtype=np.uint8)
    return out.tobytes()


CFG = CodecConfig(use_diff=True, chunk_size=512, lane=64, layout="sharded")


def test_sharded_roundtrip():
    data = _data()
    codec = TPUCodec(CFG)
    blob = codec.encode(data)
    assert codec.decode(blob) == data


def test_sharded_roundtrip_nodiff_and_fgk():
    data = _data(1500)
    for cfg in [
        CodecConfig(chunk_size=512, lane=64, layout="sharded"),
        CodecConfig(use_diff=True, chunk_size=512, entropy="fgk",
                    layout="sharded"),
    ]:
        codec = TPUCodec(cfg)
        assert codec.decode(codec.encode(data)) == data, cfg


def test_sharded_exact_chunk_multiple():
    data = _data(1024)  # exactly 2 chunks
    codec = TPUCodec(CFG)
    assert codec.decode(codec.encode(data)) == data


@pytest.mark.parametrize("start,length", [
    (0, 100), (500, 600), (511, 2), (512, 512), (2999, 1), (0, 3000),
    (1300, 0),
])
def test_decode_range(start, length):
    data = _data()
    codec = TPUCodec(CFG)
    blob = codec.encode(data)
    assert codec.decode_range(blob, start, length) == data[start:start + length]


def test_decode_range_requires_sharded():
    data = _data(600)
    codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=512, lane=64))
    blob = codec.encode(data)
    with pytest.raises(ValueError):
        codec.decode_range(blob, 0, 10)


def test_sharded_adapt_accepted_with_band_geometry():
    # round-4: sharded adaptive is supported when chunks are bands of
    # >= 8 full matrix rows (chunk_size % width == 0)
    TPUCodec(CodecConfig(use_adapt=True, width=512, chunk_size=65536,
                         layout="sharded"))


# ---------------------------------------------------------------------------
# sharded-ADAPTIVE layout (VERDICT r3 #7): bands of rows as independent
# chunks — adaptive transform + streaming/random access in one container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_bytes,cs", [(131072, 32768), (98304, 65536)])
def test_sharded_adaptive_roundtrip_and_range(n_bytes, cs):
    import pathlib
    raw = (pathlib.Path("/root/reference/data")
           / "hd01.raw").read_bytes()[:n_bytes]
    codec = TPUCodec(CodecConfig(use_diff=True, use_adapt=True, width=512,
                                 chunk_size=cs, layout="sharded", lane=512))
    blob = codec.encode(raw)
    assert codec.decode(blob) == raw
    rng = np.random.default_rng(7)
    for _ in range(4):
        s = int(rng.integers(0, len(raw) - 900))
        ln = int(rng.integers(1, 900))
        assert codec.decode_range(blob, s, ln) == raw[s: s + ln]
    # ranges pinned at band boundaries
    assert codec.decode_range(blob, cs - 3, 6) == raw[cs - 3: cs + 3]
    assert codec.decode_range(blob, 0, 1) == raw[:1]
    assert (codec.decode_range(blob, len(raw) - 5, 5) == raw[-5:])


def test_sharded_adaptive_validation():
    with pytest.raises(ValueError):  # chunk_size not divisible by width
        TPUCodec(CodecConfig(use_adapt=True, width=500, chunk_size=65536,
                             layout="sharded"))
    with pytest.raises(ValueError):  # bands shorter than 8 rows
        TPUCodec(CodecConfig(use_adapt=True, width=16384, chunk_size=65536,
                             layout="sharded"))


def test_stage_and_run_decode_steps_match_decode():
    """The serving-split API (stage transfers / run compute) must produce
    exactly decode()'s bytes — it is what the bench times."""
    import jax

    data = _data(4096)
    codec = TPUCodec(CFG)
    blob = codec.encode(data)
    hdr, staged = codec.stage_decode_steps(blob)
    parts = codec.run_decode_steps(hdr, staged)
    flat = np.concatenate([np.asarray(p) for p in parts])[: hdr["orig"]]
    assert flat.tobytes() == data
    # staged steps are reusable (stateless compute)
    parts2 = codec.run_decode_steps(hdr, staged)
    jax.block_until_ready(parts2)
    assert np.concatenate(
        [np.asarray(p) for p in parts2])[: hdr["orig"]].tobytes() == data


def test_v3_corrupt_containers_fail_loudly():
    data = _data(4096)
    codec = TPUCodec(CFG)
    blob = bytearray(codec.encode(data))
    # bad magic
    b = bytes(blob); bad = b"XXXXXX" + b[6:]
    with pytest.raises(ValueError):
        codec.decode(bad)
    # wrong container version
    bad = b[:6] + bytes([99]) + b[7:]
    with pytest.raises(ValueError):
        codec.decode(bad)
    # truncated mid-manifest
    with pytest.raises(Exception):
        codec.decode(b[:40])
    # flipped byte at the payload start (always real codeword bits)
    # -> wrong symbols -> crc32 integrity failure
    hdr = codec._parse(b)
    flipped = bytearray(b)
    flipped[hdr["payload_off"]] ^= 0xFF
    with pytest.raises(Exception):
        codec.decode(bytes(flipped))


def test_sharded_adaptive_short_tail_band():
    """hd01extra shape class: rows not divisible by the band height — the
    tail band (5 rows here) tiles at its own clamped geometry."""
    import pathlib
    raw = (pathlib.Path("/root/reference/data/hd01extra.raw")
           .read_bytes()[: 133 * 512])
    codec = TPUCodec(CodecConfig(use_diff=True, use_adapt=True, width=512,
                                 chunk_size=65536, layout="sharded",
                                 lane=512))
    blob = codec.encode(raw)
    assert codec.decode(blob) == raw
    assert codec.decode_range(blob, 65530, 20) == raw[65530:65550]


def test_v3_mutation_fuzz_never_silently_corrupts():
    """Single-byte mutations over the whole container: decode must either
    raise (any controlled exception) or return the original bytes (the
    mutation landed in dead padding) — never silently corrupted output.
    The crc32 integrity check is what makes this hold for payload hits."""
    data = _data(2048)
    codec = TPUCodec(CFG)
    blob = bytearray(codec.encode(data))
    rng = np.random.default_rng(23)
    checked = 0
    for _ in range(40):
        pos = int(rng.integers(0, len(blob)))
        old = blob[pos]
        blob[pos] ^= int(rng.integers(1, 256))
        try:
            out = codec.decode(bytes(blob))
            assert out == data, f"silent corruption at byte {pos}"
        except Exception:
            pass  # loud failure is the contract
        finally:
            blob[pos] = old
        checked += 1
    assert checked == 40
