"""True multi-process jax.distributed CI (SURVEY.md §4): two local
processes, virtual CPU devices, one global mesh — the same
distributed_encode_step / distributed_decode_step /
distributed_adapt_encode_step collectives that run on a pod slice.

Skipped gracefully when the jax build lacks multi-process CPU support.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

PRELUDE = r"""
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
import zlib
assert len(jax.devices()) == 4, jax.devices()
"""

WORKER_ENCODE = PRELUDE + r"""
from huffman_codec_tpu.models.chunked import _n_words_for
from huffman_codec_tpu.parallel.mesh import (
    default_mesh, distributed_encode_step, sharded_cap)

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
csum = 0
for a in (buf, lane_words, tables, rle_lens, carries):
    csum = zlib.crc32(np.asarray(a).tobytes(), csum)
print("OK", csum, flush=True)
"""

WORKER_DECODE = PRELUDE + r"""
from huffman_codec_tpu.models.chunked import _n_words_for
from huffman_codec_tpu.parallel.mesh import (
    default_mesh, distributed_decode_step, distributed_encode_step,
    sharded_cap)

mesh = default_mesh()
chunk_size, n_chunks, lane = 64, 4, 64
n = chunk_size * n_chunks
rng = np.random.default_rng(11)
raw = rng.integers(0, 8, n, dtype=np.uint8)
n_words = _n_words_for(sharded_cap(chunk_size, "canonical", lane), "canonical")
buf, lane_words, tables, rle_lens, carries = distributed_encode_step(
    jnp.asarray(raw), jnp.int32(n), mesh, chunk_size, n_words,
    use_diff=True, entropy="canonical", lane=lane)
out = distributed_decode_step(
    buf.reshape(n_chunks, -1), rle_lens, carries, mesh, chunk_size,
    tables, lane_words, use_diff=True, entropy="canonical", lane=lane)
assert bytes(np.asarray(out)[:n]) == raw.tobytes(), "2-proc decode mismatch"
print("OK", zlib.crc32(np.asarray(out).tobytes()), flush=True)
"""

WORKER_ADAPTIVE = PRELUDE + r"""
from huffman_codec_tpu.models.chunked import _n_words_for, _sharded_cap
from huffman_codec_tpu.parallel.mesh import (
    default_mesh, distributed_adapt_decode_step,
    distributed_adapt_encode_step)

mesh = default_mesh()
w, band_h, bs, lane = 128, 16, 8, 64
cs = band_h * w
n_bands = 4
n = n_bands * cs
rng = np.random.default_rng(13)
raw = rng.integers(0, 6, n, dtype=np.uint8)
(buf, lw, tables, totals, dirs, tlens,
 carries) = distributed_adapt_encode_step(
    jnp.asarray(raw), mesh, w, band_h, bs, True, "canonical", lane)
csum = 0
for a in (buf, lw, tables, totals, dirs, tlens, carries):
    csum = zlib.crc32(np.asarray(a).tobytes(), csum)
cap = _sharded_cap(cs, "canonical", lane)
wpc = _n_words_for(cap, "canonical", lane)
out = distributed_adapt_decode_step(
    buf.reshape(buf.shape[0], wpc), totals, tlens, dirs, carries,
    tables, lw, mesh, w, band_h, bs, True, lane)
assert bytes(np.asarray(out)[:n]) == raw.tobytes(), "2-proc adapt mismatch"
print("OK", csum, flush=True)
"""


def _run_two_process(tmp_path, worker_src):
    """Launch the worker in 2 coordinated processes; return both stdouts.
    Skips ONLY on genuine environment failures — a crash inside the codec
    must FAIL, not skip (the round-3 over-broad match on "distributed"
    converted a real unpack bug into a skip)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(worker_src % {"repo": REPO, "port": port})
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
    return [o for o, _ in outs]


def test_two_process_mesh(tmp_path):
    outs = _run_two_process(tmp_path, WORKER_ENCODE)
    # both processes must agree on the gathered manifest checksum
    sums = [o.split("OK ")[1].strip() for o in outs]
    assert sums[0] == sums[1]


def test_two_process_decode(tmp_path):
    """distributed_decode_step across 2 real processes: each process
    decodes the mesh-encoded stream and must reconstruct the input
    (asserted in-worker) with both processes agreeing on the bytes."""
    outs = _run_two_process(tmp_path, WORKER_DECODE)
    sums = [o.split("OK ")[1].strip() for o in outs]
    assert sums[0] == sums[1]


def test_two_process_adaptive(tmp_path):
    """distributed_adapt_encode_step + distributed_adapt_decode_step
    across 2 real processes: manifest checksums agree and the adaptive
    round-trip reconstructs the input (asserted in-worker)."""
    outs = _run_two_process(tmp_path, WORKER_ADAPTIVE)
    sums = [o.split("OK ")[1].strip() for o in outs]
    assert sums[0] == sums[1]
