"""zstd trajectory compression (compress-then-delete), the analog of the
reference's CodecZstd path (/root/reference/src/io.jl:207-223). Uses the
C-backed ``zstandard`` package (libzstd), streaming so arbitrarily large
trajectories compress in constant memory."""

from __future__ import annotations

import os

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover - zstandard is in the base image
    _zstd = None


def compress_zstd(filepath, level: int = 3, remove_original: bool = True) -> str:
    """Compress ``filepath`` to ``filepath + '.zst'`` and delete the original
    (matching /root/reference/src/io.jl:207-223). Returns the output path."""
    output_file = filepath + ".zst"
    if _zstd is None:
        raise RuntimeError("zstandard package is unavailable")
    cctx = _zstd.ZstdCompressor(level=level)
    with open(filepath, "rb") as infile, open(output_file, "wb") as outfile:
        cctx.copy_stream(infile, outfile)
    if remove_original:
        os.remove(filepath)
    return output_file


def decompress_zstd(filepath, remove_original: bool = False) -> str:
    """Inverse of compress_zstd (utility; not present in the reference)."""
    if _zstd is None:
        raise RuntimeError(
            "zstandard package is unavailable; cannot decompress")
    if not filepath.endswith(".zst"):
        raise ValueError("expected a .zst file")
    output_file = filepath[: -len(".zst")]
    dctx = _zstd.ZstdDecompressor()
    with open(filepath, "rb") as infile, open(output_file, "wb") as outfile:
        dctx.copy_stream(infile, outfile)
    if remove_original:
        os.remove(filepath)
    return output_file
