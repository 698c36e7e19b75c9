"""True multi-process jax.distributed CI (SURVEY.md §4): two local
processes, virtual CPU devices, one global mesh — the same
distributed_encode_step that runs on a pod slice.

Skipped gracefully when the jax build lacks multi-process CPU support.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:%(port)d",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import jax.numpy as jnp
from huffman_codec_tpu.models.chunked import _n_words_for
from huffman_codec_tpu.parallel.mesh import (
    default_mesh, distributed_encode_step, sharded_cap)

assert len(jax.devices()) == 4, jax.devices()
mesh = default_mesh()
chunk_size, n_chunks, lane = 64, 4, 64
n = chunk_size * n_chunks
rng = np.random.default_rng(7)
raw = rng.integers(0, 8, n, dtype=np.uint8)
data = jnp.asarray(raw)
n_words = _n_words_for(sharded_cap(chunk_size, "canonical", lane), "canonical")
buf, lane_words, tables, rle_lens, carries = distributed_encode_step(
    data, jnp.int32(n), mesh, chunk_size, n_words, use_diff=True,
    entropy="canonical", lane=lane)
# cross-process agreement on the full gathered manifest, not just a sum:
# checksum every column (the container writer consumes exactly these)
import zlib
csum = 0
for a in (buf, lane_words, tables, rle_lens, carries):
    csum = zlib.crc32(np.asarray(a).tobytes(), csum)
print("OK", csum, flush=True)
"""


def test_two_process_mesh(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO, "port": port})
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=150) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process CPU collectives timed out on this build")
    for (out, err), p in zip(outs, procs):
        if p.returncode != 0:
            # skip ONLY on genuine environment failures (no multi-process
            # support / coordination service unreachable) — a crash inside
            # the codec must FAIL, not skip (the round-3 over-broad match
            # on "distributed" converted a real unpack bug into a skip)
            env_markers = (
                "UNIMPLEMENTED", "Unimplemented", "UNAVAILABLE",
                "DEADLINE_EXCEEDED",
                "coordination service",
                "distributed service is not supported",
            )
            if any(m in err for m in env_markers):
                pytest.skip(f"jax.distributed unsupported here: {err[-200:]}")
            raise AssertionError(err[-2000:])
        assert "OK" in out
    # both processes must agree on the gathered manifest checksum
    sums = [o.split("OK ")[1].strip() for o, _ in outs]
    assert sums[0] == sums[1]
