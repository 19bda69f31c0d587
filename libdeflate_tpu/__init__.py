"""libdeflate_tpu — a TPU-native whole-buffer DEFLATE/zlib/gzip codec.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ebiggers/libdeflate (see SURVEY.md): raw DEFLATE, zlib, and gzip whole-buffer
compression (levels 0-12) and decompression, plus Adler-32 and CRC-32
checksums, designed chunk-data-parallel over TPU meshes rather than as a port
of the reference's C.
"""

__version__ = "0.1.0"

from .ops.checksums_host import adler32, adler32_combine, crc32  # noqa: F401
from .ops.crc32_math import crc32_combine  # noqa: F401
from .formats.deflate import deflate_compress_bound  # noqa: F401
