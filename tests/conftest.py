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
# NO persistent compilation cache for the CPU test suite: XLA:CPU cache
# entries are AOT machine code, and this rig's loader executes entries
# whose target features don't match the host (it warns "could lead to
# execution errors such as SIGILL") — observed as heap corruption that
# segfaults a LATER in-process compile, reproducibly killing the full
# suite mid-run while every file passes in isolation. Recompiling is the
# reliable option; the TPU bench keeps its own cache (bench.py).
for _v in ("JAX_COMPILATION_CACHE_DIR",
           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
           "JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES"):
    os.environ.pop(_v, None)

import pytest

# The axon sitecustomize hook may have imported jax and registered the TPU
# backend before this conftest ran; the config update below re-pins platform
# selection (it is honored until the first backend actually initializes).
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_per_module():
    """XLA:CPU segfaults deterministically once a single process has
    accumulated enough compiled executables (reproduced: any ~8-module
    prefix of this suite followed by test_quality's compiles crashes in
    backend_compile_and_load; every subset passes). Dropping the jit
    caches between modules keeps the process under the threshold; the
    xdist loadfile split in pytest.ini halves it again."""
    yield
    try:
        import jax

        jax.clear_caches()
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
