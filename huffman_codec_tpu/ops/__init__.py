"""JAX/XLA device ops — the TPU compute path of the framework.

Every op is jittable, static-shaped (padded buffers + true-length scalars),
and designed for `vmap`/`shard_map` fan-out across chunks, tiles and devices:

- ``diff``  — differential model (transform.cpp:220-239) as shift / cumsum
- ``rle``   — MNP-5 byte RLE (transform.cpp:241-292) as a vectorized
              emission-formula encoder and a block-FSM parallel decoder
- ``fgk``   — FGK adaptive Huffman (huffman.cpp) as array-slot state under
              ``lax.scan``, batched over chunks with ``vmap``
- ``pack``  — MSB-first bitstream packing via non-overlapping scatter-add
"""

from huffman_codec_tpu.ops.diff import diff_apply, diff_revert  # noqa: F401
from huffman_codec_tpu.ops.rle import (  # noqa: F401
    rle_decode,
    rle_encode,
    rle_encoded_size,
    rle_max_encoded_len,
)
