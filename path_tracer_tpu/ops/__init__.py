"""Device compute ops: tone mapping, RNG, intersection, BSDF sampling.

Everything here is pure jnp (jit/vmap/shard_map friendly); the Pallas
kernels live in ``ops.pallas``.
"""
