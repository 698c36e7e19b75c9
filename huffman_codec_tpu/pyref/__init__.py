"""Exact scalar model of the reference wire format (oracle-grade).

Slow (pure Python) but bit-exact: used by the test suite as the trusted
in-process implementation, cross-checked against the upstream C++ binary.
"""

from huffman_codec_tpu.pyref.codec import compress, decompress  # noqa: F401
from huffman_codec_tpu.pyref.fgk import FGKTree  # noqa: F401
from huffman_codec_tpu.pyref.rle import rle_decode, rle_encode  # noqa: F401
