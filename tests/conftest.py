"""Shared fixtures: the compiled reference oracle + virtual CPU mesh for JAX.

JAX tests run on a virtual 8-device CPU mesh so the multi-chip sharding path
is exercised without TPU hardware (same shard_map code runs on a real slice).
"""

import os
import pathlib
import subprocess

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import pytest

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
