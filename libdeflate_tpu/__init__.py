"""libdeflate_tpu — a TPU-native whole-buffer DEFLATE/zlib/gzip codec.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ebiggers/libdeflate (see SURVEY.md): raw DEFLATE, zlib, and gzip whole-buffer
compression (levels 0-12) and decompression, plus Adler-32 and CRC-32
checksums, designed chunk-data-parallel over TPU meshes rather than as a port
of the reference's C.
"""

__version__ = "0.1.0"

from .api import (  # noqa: F401
    BAD_DATA,
    INSUFFICIENT_SPACE,
    SHORT_OUTPUT,
    SUCCESS,
    Compressor,
    Decompressor,
    adler32,
    adler32_combine,
    crc32,
    crc32_combine,
    deflate_compress_bound,
    gzip_compress_bound,
    zlib_compress_bound,
)
