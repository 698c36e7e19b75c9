"""ctypes bindings for the hctpu C++ runtime (native/hctpu.cpp).

The shared library is built by ``make -C native`` into this directory; if it
is missing we attempt a one-shot build (g++ is part of the baked toolchain).
"""

from huffman_codec_tpu.native.runtime import (  # noqa: F401
    NativeError,
    available,
    rle_decode,
    rle_encode,
    v1_compress,
    v1_decompress,
    v2_compress,
    v2_decompress,
)
