"""Scene model layer: materials, camera, geometry, scene schema, registry.

Mirrors the reference's L1 layer (``src/render/mod.rs:78-344,406-536``,
``src/render/scenes.rs``, ``src/render/load_off.rs``) with identical JSON/OFF
formats, but re-shaped for SoA device buffers (see ``scene.ScenePacked``).
"""
