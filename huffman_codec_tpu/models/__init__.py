"""Pipeline presets ("model families") of the framework.

- ``chunked``   — TPUCodec: the flagship v3 device container (chunk-parallel
                  FGK + manifest-parallel transforms, encode AND decode fully
                  on device)
- ``reference`` — V1Codec: the reference-compatible v1 wire format driven
                  through the same device ops (single FGK stream), plus the
                  native-runtime fast path
"""

from huffman_codec_tpu.models.chunked import TPUCodec, CodecConfig  # noqa: F401
from huffman_codec_tpu.models.reference import V1Codec  # noqa: F401
