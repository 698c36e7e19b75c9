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


def test_sharded_rejects_adapt():
    with pytest.raises(ValueError):
        TPUCodec(CodecConfig(use_adapt=True, layout="sharded"))
