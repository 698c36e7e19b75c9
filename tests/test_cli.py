"""CLI parity: flags, defaults, stderr contract, exit codes vs the oracle."""

import os
import pathlib
import subprocess
import sys

import pytest

PY = [sys.executable, "-m", "huffman_codec_tpu"]
REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(PY + args, capture_output=True, cwd=cwd, text=False,
                          env=env)


@pytest.fixture()
def sample(tmp_path):
    p = tmp_path / "in.raw"
    p.write_bytes(bytes(range(256)) * 8)
    return p


def test_roundtrip_default_output(tmp_path, sample):
    r = run_cli(["-c", "-i", str(sample)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    out = tmp_path / "b.out"  # default path (main.cpp:160)
    assert out.exists()
    assert b"writing" in r.stderr and b"b.out" in r.stderr
    r = run_cli(["-d", "-i", str(out), "-o", str(tmp_path / "dec.bin")],
                cwd=tmp_path)
    assert r.returncode == 0
    assert (tmp_path / "dec.bin").read_bytes() == sample.read_bytes()


def test_later_flags_override(tmp_path, sample):
    """-c -d == decompress (main.cpp getopt loop semantics)."""
    c = run_cli(["-c", "-m", "-i", str(sample), "-o", str(tmp_path / "c.bin")],
                cwd=tmp_path)
    assert c.returncode == 0
    r = run_cli(["-c", "-d", "-i", str(tmp_path / "c.bin"),
                 "-o", str(tmp_path / "d.bin")], cwd=tmp_path)
    assert r.returncode == 0
    assert (tmp_path / "d.bin").read_bytes() == sample.read_bytes()


def test_exit_codes(tmp_path, sample):
    # 1: missing option argument
    assert run_cli(["-i"], cwd=tmp_path).returncode == 1
    # 2: unknown option
    assert run_cli(["-x"], cwd=tmp_path).returncode == 2
    # 3: no input path
    assert run_cli(["-c"], cwd=tmp_path).returncode == 3
    # 4: zero width with compression
    assert run_cli(["-c", "-w", "0", "-i", str(sample)],
                   cwd=tmp_path).returncode == 4
    # 5: unreadable input
    assert run_cli(["-c", "-i", str(tmp_path / "nope")],
                   cwd=tmp_path).returncode == 5
    # 6: size % width != 0 with -a
    odd = tmp_path / "odd.bin"
    odd.write_bytes(b"x" * 100)
    assert run_cli(["-c", "-a", "-w", "512", "-i", str(odd)],
                   cwd=tmp_path).returncode == 6
    # 8: truncated huffman header
    short = tmp_path / "short.bin"
    short.write_bytes(b"abc")
    assert run_cli(["-d", "-i", str(short)], cwd=tmp_path).returncode == 8
    # 9: bitstream underrun
    bad = tmp_path / "bad.bin"
    bad.write_bytes(bytes([255, 0, 0, 0, 0, 0, 0, 0, 0, 0]))
    assert run_cli(["-d", "-i", str(bad)], cwd=tmp_path).returncode == 9
    # 12: too small matrix with -a
    tiny = tmp_path / "tiny.bin"
    tiny.write_bytes(b"x" * 12)
    assert run_cli(["-c", "-a", "-w", "4", "-i", str(tiny)],
                   cwd=tmp_path).returncode == 12


def test_help():
    r = subprocess.run(PY + ["-h"], capture_output=True, text=True)
    assert r.returncode == 0
    assert "USAGE" in r.stdout and "-w" in r.stdout


def test_interop_with_oracle(tmp_path, sample, oracle):
    """CLI output decodes with the C++ binary and vice versa."""
    ours = tmp_path / "ours.bin"
    r = run_cli(["-c", "-m", "-i", str(sample), "-o", str(ours)], cwd=tmp_path)
    assert r.returncode == 0
    dec = tmp_path / "dec.bin"
    o = subprocess.run([str(oracle), "-d", "-i", str(ours), "-o", str(dec)],
                       capture_output=True)
    assert o.returncode == 0
    assert dec.read_bytes() == sample.read_bytes()

    ref = tmp_path / "ref.bin"
    o = subprocess.run([str(oracle), "-c", "-m", "-i", str(sample),
                        "-o", str(ref)], capture_output=True)
    assert o.returncode == 0
    assert ref.read_bytes() == ours.read_bytes()
    back = tmp_path / "back.bin"
    r = run_cli(["-d", "-i", str(ref), "-o", str(back)], cwd=tmp_path)
    assert r.returncode == 0
    assert back.read_bytes() == sample.read_bytes()


def test_v2_v3_formats(tmp_path, sample):
    for fmt in ["v2", "v3"]:
        c = tmp_path / f"{fmt}.bin"
        d = tmp_path / f"{fmt}.dec"
        r = run_cli(["-c", "-m", f"--format={fmt}", "--chunk-size=4096",
                     "-i", str(sample), "-o", str(c)], cwd=tmp_path)
        assert r.returncode == 0, (fmt, r.stderr)
        r = run_cli(["-d", f"--format={fmt}", "--chunk-size=4096",
                     "-i", str(c), "-o", str(d)], cwd=tmp_path)
        assert r.returncode == 0, (fmt, r.stderr)
        assert d.read_bytes() == sample.read_bytes()
