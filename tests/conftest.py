"""Shared fixtures: the compiled reference oracle + virtual CPU mesh for JAX.

JAX tests run on a virtual 8-device CPU mesh so the multi-chip sharding path
is exercised without TPU hardware (same shard_map code runs on a real slice).
"""

import os
import pathlib
import subprocess

# Must be set before jax backends initialize. Forced (not setdefault): the
# session environment may export JAX_PLATFORMS=axon (the real-TPU tunnel,
# registered by a sitecustomize hook), but unit tests run on the virtual
# 8-device CPU mesh; bench.py is what exercises the real chip. Exported so
# CLI subprocess tests inherit the same platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU hook
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
# Persistent compilation cache: the codec's scan/while kernels take tens of
# seconds to compile; cache them across test runs and subprocesses.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hctpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import pytest

# The axon sitecustomize hook may have imported jax and registered the TPU
# backend before this conftest ran; the config update below re-pins platform
# selection (it is honored until the first backend actually initializes).
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")
ORACLE = REPO / ".oracle" / "huffman-codec"
DATA = REFERENCE / "data"


def _ensure_oracle() -> pathlib.Path:
    """Compile the upstream C++ reference once; it is the ground truth."""
    if ORACLE.exists():
        return ORACLE
    ORACLE.parent.mkdir(exist_ok=True)
    srcs = sorted(str(p) for p in (REFERENCE / "src").glob("*.cpp"))
    subprocess.run(
        ["g++", "-std=c++17", "-O2", *srcs, "-o", str(ORACLE)],
        check=True,
        capture_output=True,
    )
    return ORACLE


@pytest.fixture(scope="session")
def oracle():
    return _ensure_oracle()


@pytest.fixture(scope="session")
def corpus():
    """The reference test corpus (512x512 8-bit grayscale RAWs + variants)."""
    return sorted(DATA.glob("*.raw"))


def run_oracle(oracle_path, args, tmp_path, data: bytes, name="in.bin"):
    """Run the reference binary on `data`, return (exit_code, output bytes)."""
    inp = tmp_path / name
    out = tmp_path / "out.bin"
    inp.write_bytes(data)
    proc = subprocess.run(
        [str(oracle_path), *args, "-i", str(inp), "-o", str(out)],
        capture_output=True,
    )
    return proc.returncode, out.read_bytes() if out.exists() else b""
