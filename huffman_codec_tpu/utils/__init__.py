"""Aux subsystems: profiling/tracing and structured metrics (SURVEY.md §5).

The reference has no observability beyond one stderr line and a debug tree
dump (huffman.cpp:130-132); the rebuild gets per-stage timers, optional
jax.profiler traces, and structured bpc/throughput reporting.
"""

from huffman_codec_tpu.utils.profiling import StageTimer, device_trace  # noqa: F401
from huffman_codec_tpu.utils.metrics import CodecMetrics  # noqa: F401
