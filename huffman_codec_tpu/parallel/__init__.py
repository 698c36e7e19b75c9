"""Multi-chip execution: jax.sharding Mesh + shard_map data parallelism.

The reference is single-threaded (SURVEY.md §2.8); this layer is the
rebuild's scaling story: independent FGK chunks shard across devices,
the diff model's one-byte boundary carry rides a ``ppermute``, and the
per-chunk manifest is assembled with an ``all_gather`` — all XLA
collectives over ICI, no hand-written transport.
"""

from huffman_codec_tpu.parallel.mesh import (  # noqa: F401
    default_mesh,
    distributed_decode_step,
    distributed_encode_step,
)
