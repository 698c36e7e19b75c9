"""Compression-quality guard: v3 canonical must stay near the reference's
adaptive-FGK sizes (BASELINE.md §B) — the per-chunk optimal tables should
make up for the manifest overhead."""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from huffman_codec_tpu.models import CodecConfig, TPUCodec  # noqa: E402

DATA = pathlib.Path("/root/reference/data")

# reference v1 `-m` compressed bytes measured on this machine (BASELINE.md §B)
REF_M = {"hd01.raw": 88113, "hd02.raw": 86556}


@pytest.mark.parametrize("name", sorted(REF_M))
def test_v3_size_near_reference(name):
    raw = (DATA / name).read_bytes()
    codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=65536))
    blob = codec.encode(raw)
    assert len(blob) <= REF_M[name] * 1.03, (len(blob), REF_M[name])
    assert codec.decode(blob) == raw


def test_incompressible_expansion_bounded():
    raw = np.random.default_rng(0).integers(
        0, 256, 1 << 16, dtype=np.uint8).tobytes()
    codec = TPUCodec(CodecConfig(use_diff=True, chunk_size=65536))
    blob = codec.encode(raw)
    # random bytes: ~8 bpc + container overhead must stay small
    assert len(blob) <= len(raw) * 1.40
    assert codec.decode(blob) == raw
