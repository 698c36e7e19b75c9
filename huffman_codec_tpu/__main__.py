"""``python -m huffman_codec_tpu`` — the reference-compatible CLI."""

import sys

from huffman_codec_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
