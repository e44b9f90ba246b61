"""Image content hashing.

Role parity with ``hash_vec_of_vectors`` (``mod.rs:916-926``): a cheap,
deterministic digest over the f32 bit patterns of all pixels, used as a
cache-invalidation key by viewers. We use FNV-1a 64-bit (stable across
platforms/processes, unlike Rust's DefaultHasher which is SipHash with a
process-random key — bitwise parity with the reference is impossible and not
needed; only self-consistency matters).
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
MASK64 = (1 << 64) - 1


def hash_image(pixels: np.ndarray) -> int:
    """FNV-1a over the little-endian f32 bit patterns of all components."""
    from path_tracer_tpu.native import native_hash_image

    native = native_hash_image(np.asarray(pixels, np.float32))
    if native is not None:
        return native
    data = np.ascontiguousarray(pixels, np.float32).tobytes()
    h = FNV_OFFSET
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & MASK64
    return h
