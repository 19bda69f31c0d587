"""Whole-file chunk-parallel compression over a device mesh.

The flagship end-to-end path (BASELINE.json north star): a file is split into
<=1 MB chunks sharded over the mesh, each chunk becomes a byte-aligned
sync-flushed DEFLATE fragment on its device, fragments are gathered in order
(pure byte concatenation — no bit shifting), and the gzip/zlib trailer is
computed from per-chunk device checksums via the O(log n) combine operators.

Per-chunk stored fallback preserves the compress_bound contract on
incompressible chunks, exactly like the reference's cost comparison picks
stored blocks (lib/deflate_compress.c:1779-1814).
"""

from __future__ import annotations

import numpy as np

from ..compress.emit import BitWriter
from ..compress.tpu_pipeline import device_stream_to_bytes
from ..formats import gzip_fmt, zlib_fmt
from ..ops.checksums_host import adler32_combine
from ..ops.crc32_math import crc32_combine
from . import mesh as mesh_mod

DEFAULT_CHUNK_SIZE = 1 << 20


def stored_fragment(chunk: bytes, bfinal: bool) -> bytes:
    """Byte-aligned stored-block fragment with trailing sync-flush marker."""
    w = BitWriter()
    pos = 0
    n = len(chunk)
    while pos < n:
        seg = min(n - pos, 65535)
        w.add(0, 1)
        w.add(0, 2)
        w.align_to_byte()
        w.out += seg.to_bytes(2, "little")
        w.out += (~seg & 0xFFFF).to_bytes(2, "little")
        w.out += chunk[pos : pos + seg]
        pos += seg
    # sync-flush: empty stored block carrying BFINAL
    w.add(1 if bfinal else 0, 1)
    w.add(0, 2)
    w.align_to_byte()
    w.out += b"\x00\x00\xff\xff"
    return w.finish()


def _adler_combine_chunks(adlers: np.ndarray, lengths: np.ndarray, n: int) -> int:
    a = 1
    for i in range(n):
        a = adler32_combine(a, int(adlers[i]), int(lengths[i]))
    return a


def deflate_compress_dp(
    data: bytes,
    mesh=None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    level: int = 1,
) -> tuple[bytes, int, int]:
    """Chunk-parallel raw DEFLATE.  Returns (stream, crc32, adler32).

    level 1 emits static-code blocks (fastest); levels >= 2 use per-chunk
    dynamic Huffman codes.  The checksums of the *uncompressed* data come
    along for free from the device pass, pre-combined for wrapper trailers.
    """
    if mesh is None:
        mesh = mesh_mod.make_chunk_mesh()
    ndev = mesh.devices.size

    if len(data) == 0:
        return stored_fragment(b"", True), 0, 1

    bufs, lengths, bfinal, nchunks = mesh_mod.pad_chunks(data, chunk_size, ndev)
    words, total_bits, crcs, adlers, all_bits = mesh_mod.compress_chunks_dp(
        mesh, bufs, lengths, bfinal, level=level
    )
    words = np.asarray(words)
    # the all-gathered sizes are the global byte layout every participant
    # sees (the piece a multi-host assembly needs); use them for assembly
    total_bits = np.asarray(all_bits)
    crcs = np.asarray(crcs)
    adlers = np.asarray(adlers)

    parts = []
    for i in range(nchunks):
        dev_bytes = int(total_bits[i]) // 8
        chunk = data[i * chunk_size : i * chunk_size + int(lengths[i])]
        stored_size = 5 * max(-(-len(chunk) // 65535), 1) + len(chunk) + 5
        if dev_bytes <= stored_size:
            parts.append(device_stream_to_bytes(words[i], total_bits[i]))
        else:
            parts.append(stored_fragment(chunk, bool(bfinal[i])))
    stream = b"".join(parts)

    crc = 0
    for i in range(nchunks):
        crc = crc32_combine(crc, int(crcs[i]), int(lengths[i]))
    adler = _adler_combine_chunks(adlers, lengths, nchunks)
    return stream, crc, adler


def gzip_compress_dp(data: bytes, mesh=None, chunk_size: int = DEFAULT_CHUNK_SIZE,
                     level: int = 1) -> bytes:
    stream, crc, _ = deflate_compress_dp(data, mesh, chunk_size, level)
    return (
        gzip_fmt.make_header(level)
        + stream
        + gzip_fmt.make_trailer(crc, len(data))
    )


def zlib_compress_dp(data: bytes, mesh=None, chunk_size: int = DEFAULT_CHUNK_SIZE,
                     level: int = 1) -> bytes:
    stream, _, adler = deflate_compress_dp(data, mesh, chunk_size, level)
    return (
        zlib_fmt.make_header(level)
        + stream
        + zlib_fmt.make_trailer(adler)
    )
