"""path_tracer_tpu — a TPU-native Monte-Carlo path-tracing framework.

A ground-up rebuild of the capabilities of ``filippo-orru/path-tracer-rust``
(a Rust/rayon port of the smallpt-family ``cgrpt`` tracer) designed TPU-first:

- the per-pixel recursive integrator becomes a flat megabatch of rays stepped
  with ``lax.scan`` over bounce depth (wavefront tracing),
- ray/primitive intersection is reformulated as MXU matmuls (Möller–Trumbore
  and the sphere quadratic are affine in per-ray features ``[d, o×d, o, 1]``),
- scaling happens via ``jax.sharding`` meshes + ``shard_map``, not threads,
- RNG is counter-based threefry (deterministic replay under any parallelism),
- host-side IO (OFF meshes, PPM images, hashing) runs through a C++ native
  runtime (``csrc/``) with pure-Python fallbacks.

Scene JSON files, OFF meshes, camera intrinsics, and tone mapping are
schema/semantics-compatible with the reference so renders match it in
expectation (RMSE parity at equal spp).
"""

from path_tracer_tpu.version import __version__

from path_tracer_tpu.models.material import Material, ReflectType
from path_tracer_tpu.models.camera import Camera
from path_tracer_tpu.models.geometry import Mesh, Triangle
from path_tracer_tpu.models.scene import (
    SceneDescriptor,
    SceneObject,
    ScenePacked,
    pack_scene,
)
from path_tracer_tpu.models.scenes import builtin_scenes, load_scene, load_scene_ids
from path_tracer_tpu.utils.config import RenderConfig, Resolution
# NOTE: this must stay an eager import — `render` (the function) shares its
# name with the `render` subpackage, and only an explicit module-level
# assignment shadows the submodule binding (a lazy __getattr__ never fires
# for an attribute that already exists). A light daemon client isn't worth
# the trap: this container's sitecustomize imports jax at interpreter start
# anyway.
from path_tracer_tpu.render.pipeline import render, RenderDone, RenderUpdate

__all__ = [
    "__version__",
    "Material",
    "ReflectType",
    "Camera",
    "Mesh",
    "Triangle",
    "SceneDescriptor",
    "SceneObject",
    "ScenePacked",
    "pack_scene",
    "builtin_scenes",
    "load_scene",
    "load_scene_ids",
    "RenderConfig",
    "Resolution",
    "render",
    "RenderDone",
    "RenderUpdate",
]
