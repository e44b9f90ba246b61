"""Multi-device / multi-host scaling.

The reference's only parallelism is rayon work-stealing over shuffled pixels
within one host (``mod.rs:1020-1023``). The TPU-native equivalent is a
``jax.sharding.Mesh`` with two axes:

- ``dp``: pixels sharded across devices (no communication needed),
- ``sp``: samples sharded across devices (one ``psum`` over ICI to merge
  partial radiance sums).

plus ``jax.distributed`` initialization for multi-host pods (DCN only carries
scene broadcast and result collection; all render-path collectives ride ICI).
"""
