"""huffman_codec_tpu — a TPU-native lossless codec framework.

A from-scratch rebuild of the capabilities of dominiksalvet/huffman-codec
(differential model, MNP-5 byte RLE, adaptive block RLE with per-block scan
direction, FGK adaptive Huffman coding) designed TPU-first:

- ``pyref``     — exact scalar model of the reference wire format (oracle-grade)
- ``native``    — C++ runtime (array-based FGK, O(log n) successor search) for
                  the serial reference-format (v1) hot path, via ctypes
- ``ops``       — JAX/XLA/Pallas device ops: diff model, vectorized RLE,
                  adaptive block-RLE search, chunked-parallel FGK (format v2)
- ``parallel``  — jax.sharding Mesh / shard_map data-parallel encode/decode
- ``models``    — pipeline presets (stream/adaptive x diff) and the flagship
                  chunked codec model
- ``utils``     — container formats, bit packing, IO helpers

Reference behavior citations use ``file:line`` into the upstream C++ repo
(mounted read-only at /root/reference) so parity can be audited.
"""

__version__ = "0.1.0"

from huffman_codec_tpu.formats import (  # noqa: F401
    FLAG_ADAPT,
    FLAG_DIFF,
    HUFF_HEADER_BYTES,
    make_huff_header,
    parse_huff_header,
)
