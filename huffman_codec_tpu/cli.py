"""Command-line interface — same flag surface, defaults, stderr messages and
exit codes as the reference binary (main.cpp:152-221; SURVEY.md §2.1/§2.7),
plus framework extensions behind long options.

Reference semantics preserved exactly:
- ``-c`` is the default; later ``-c``/``-d`` flags override earlier ones
- decompression ignores ``-m``/``-a``/``-w`` (everything is in the header)
- output defaults to ``b.out``; "writing N bytes to <path>" goes to stderr
- exit codes 1-15 per the reference table

Extensions (never required for reference-compatible use):
- ``--backend {native,jax,pyref}``  execution backend for v1 (default: the
  C++ runtime, falling back to pyref if the library cannot build)
- ``--format {v1,v2,v3}``  container: v1 = reference wire format (default),
  v2 = host-parallel chunked, v3 = TPU device container
- ``--chunk-size N``  chunk bytes for v2/v3 (default 65536)
- ``--threads N``  host threads for the native runtime (default: all cores)
"""

from __future__ import annotations

import getopt
import sys

HELP_MESSAGE = """USAGE:
  huffman-codec-tpu [-cm] -i IFILE [-o OFILE]
  huffman-codec-tpu [-cm] -a [-w WIDTH] -i IFILE [-o OFILE]
  huffman-codec-tpu -d -i IFILE [-o OFILE] | -h

OPTION:
  -c/-d  perform compression/decompression
  -m     use differential model for preprocessing
  -a     use adaptive block RLE (default: RLE)
  -w     width of 2D data (default: 512)
  -i     input file path
  -o     output file path (default: b.out)
  -h     show this help

FRAMEWORK OPTIONS:
  --backend {native,jax,pyref}   v1 execution backend (default: native)
  --format {v1,v2,v3}            container format (default: v1)
  --chunk-size N                 chunk bytes for v2/v3 (default: 65536)
  --threads N                    host threads for the native runtime
  --entropy {canonical,fgk}      v3 entropy mode (default: canonical)
  --lane N                       v3 canonical decode lane size (default: 512)
  --layout {global,sharded}      v3 transform layout; sharded enables
                                 random-access decode (default: global)
  --stats                        print a JSON metrics line (bpc, MB/s,
                                 chunks) to stderr after the run
  --dump-tables                  print the entropy coder's code tables /
                                 final FGK tree to stderr (the analogue
                                 of the reference's HuffTree::print)
"""

_LONG = ["backend=", "format=", "chunk-size=", "threads=",
         "entropy=", "lane=", "layout=", "stats", "dump-tables"]


def _cerrh(msg: str) -> None:
    sys.stderr.write(msg)
    sys.stderr.write("try 'huffman-codec-tpu -h' for more information\n")


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    use_compr = True  # -c is the default operation (main.cpp:155)
    use_diff = False
    use_adapt = False
    width = 512  # main.cpp:161
    ifp = None
    ofp = "b.out"  # main.cpp:160
    backend = "native"
    fmt = "v1"
    chunk_size = 1 << 16
    threads = 0
    entropy = "canonical"
    lane = 512
    layout = "global"
    stats = False
    dump_tables = False

    try:
        opts, _ = getopt.getopt(argv, ":cdmai:o:w:h", _LONG)
    except getopt.GetoptError as e:
        if "requires argument" in str(e):
            _cerrh("ERROR: missing additional argument\n")
            return 1  # main.cpp:180-182
        _cerrh("ERROR: unrecognized option used\n")
        return 2  # main.cpp:183-185

    for opt, val in opts:
        if opt == "-c":
            use_compr = True
        elif opt == "-d":
            use_compr = False
        elif opt == "-m":
            use_diff = True
        elif opt == "-a":
            use_adapt = True
        elif opt == "-i":
            ifp = val
        elif opt == "-o":
            ofp = val
        elif opt == "-w":
            try:
                width = int(val)
            except ValueError:
                width = 0
        elif opt == "-h":
            sys.stdout.write(HELP_MESSAGE)
            return 0
        elif opt == "--backend":
            backend = val
        elif opt == "--format":
            fmt = val
        elif opt == "--chunk-size":
            chunk_size = int(val)
        elif opt == "--threads":
            threads = int(val)
        elif opt == "--entropy":
            entropy = val
        elif opt == "--lane":
            lane = int(val)
        elif opt == "--layout":
            layout = val
        elif opt == "--stats":
            stats = True
        elif opt == "--dump-tables":
            dump_tables = True

    if ifp is None:
        _cerrh("ERROR: no input file path provided\n")
        return 3  # main.cpp:190-194
    if use_compr and width == 0:
        _cerrh("ERROR: invalid 2D data width\n")
        return 4  # main.cpp:195-199
    try:
        with open(ifp, "rb") as f:
            data = f.read()
    except OSError:
        sys.stderr.write("ERROR: given input file does not exist\n")
        return 5  # main.cpp:203-207

    import time

    t0 = time.perf_counter()
    try:
        out = _run(data, use_compr, use_diff, use_adapt, width, backend, fmt,
                   chunk_size, threads, entropy, lane, layout)
    except _CodecFailure as e:
        sys.stderr.write(f"ERROR: {e.message}\n")
        return e.code
    dt = time.perf_counter() - t0

    if dump_tables:
        from huffman_codec_tpu.models.chunked import V3_MAGIC
        from huffman_codec_tpu.utils.dump import dump_v1_tree, dump_v3_tables

        blob = out if use_compr else data
        try:
            if blob[:6] == V3_MAGIC:
                dump_v3_tables(blob)
            else:
                dump_v1_tree(blob)
        except Exception as e:  # noqa: BLE001 — debug aid, never fatal
            sys.stderr.write(f"dump-tables failed: {e}\n")

    if stats:
        from huffman_codec_tpu.utils.metrics import CodecMetrics

        raw_n, comp_n = (len(data), len(out)) if use_compr else (len(out),
                                                                 len(data))
        m = CodecMetrics(
            input_bytes=raw_n, output_bytes=comp_n,
            encode_s=dt if use_compr else 0.0,
            decode_s=0.0 if use_compr else dt,
            n_chunks=(-(-raw_n // chunk_size) if fmt in ("v2", "v3") else 0),
            extra={"format": fmt, "backend": backend, "op": "compress"
                   if use_compr else "decompress"})
        sys.stderr.write(m.to_json() + "\n")

    # the reference reports BEFORE attempting the write (main.cpp:218-220),
    # so the exit-7 stderr contains both lines
    sys.stderr.write(f"writing {len(out)} bytes to {ofp}\n")  # main.cpp:218
    try:
        with open(ofp, "wb") as f:
            f.write(out)
    except OSError:
        sys.stderr.write(f"ERROR: cannot write to {ofp} output file\n")
        return 7  # main.cpp:135-140
    return 0


class _CodecFailure(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code
        self.message = message


def _run(data, use_compr, use_diff, use_adapt, width, backend, fmt,
         chunk_size, threads, entropy="canonical", lane=512,
         layout="global") -> bytes:
    if fmt == "v1" and backend == "native":
        try:
            from huffman_codec_tpu.native import runtime
            runtime._load()
        except Exception:
            backend = "pyref"  # graceful fallback when no toolchain
    try:
        if fmt == "v1":
            return _run_v1(data, use_compr, use_diff, use_adapt, width,
                           backend, threads)
        if fmt == "v2":
            from huffman_codec_tpu.native import runtime

            if use_compr:
                return runtime.v2_compress(
                    data, use_diff, use_adapt, width, chunk_size, threads)
            return runtime.v2_decompress(data, threads)
        if fmt == "v3":
            from huffman_codec_tpu.models import CodecConfig, TPUCodec

            codec = TPUCodec(CodecConfig(use_diff=use_diff,
                                         use_adapt=use_adapt, width=width,
                                         chunk_size=chunk_size,
                                         entropy=entropy, lane=lane,
                                         layout=layout))
            return codec.encode(data) if use_compr else codec.decode(data)
        raise _CodecFailure(2, "unrecognized container format")
    except _CodecFailure:
        raise
    except Exception as e:  # map backend errors to reference exit codes
        raise _to_failure(e) from e


def _run_v1(data, use_compr, use_diff, use_adapt, width, backend, threads):
    if backend == "native":
        from huffman_codec_tpu.native import runtime

        if use_compr:
            return runtime.v1_compress(data, use_diff, use_adapt, width,
                                       n_threads=threads)
        return runtime.v1_decompress(data)
    if backend == "jax":
        from huffman_codec_tpu.models import CodecConfig, V1Codec

        codec = V1Codec(CodecConfig(use_diff=use_diff, use_adapt=use_adapt,
                                    width=width))
        return codec.encode(data) if use_compr else codec.decode(data)
    if backend == "pyref":
        from huffman_codec_tpu.pyref import codec as py

        if use_compr:
            return py.compress(data, use_diff, use_adapt, width)
        return py.decompress(data)
    raise _CodecFailure(2, "unrecognized backend")


def _to_failure(e: Exception) -> _CodecFailure:
    try:
        from huffman_codec_tpu.native.runtime import NativeError

        if isinstance(e, NativeError):
            return _CodecFailure(e.code, str(e))
    except Exception:
        pass
    msg = str(e) or e.__class__.__name__
    code_by_msg = {
        "invalid size of input 2D data": 6,
        "invalid or missing Huffman coding header": 8,
        "invalid Huffman coding file contents": 9,
        "invalid or missing adaptive block RLE header": 10,
        "invalid adaptive block RLE header": 11,
        "too small 2D data dimensions": 12,
        "invalid adaptive block RLE file contents": 13,
        "unexpected end of adaptive block RLE data": 14,
        "leftover data of adaptive block RLE detected": 15,
    }
    for key, code in code_by_msg.items():
        if key in msg:
            return _CodecFailure(code, key + " detected" if code == 6 else key)
    return _CodecFailure(9, msg)
