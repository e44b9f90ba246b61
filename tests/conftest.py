"""Test env: CPU backend with 8 virtual devices, set BEFORE jax imports.

Mirrors the survey's test strategy (§4): exact-geometry unit tests, a
statistical integrator test, parity tests against a literal recursive oracle,
and multi-device tests on a virtual CPU mesh so CI needs no TPU.
"""

import os

os.environ["PT_TPU_NO_DAEMON"] = "1"

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU backend and clobbers
# JAX_PLATFORMS via jax.config — override it back so tests run on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The production 16-step sync amortization in the v3 regen loop unrolls the
# fori body 16-fold, which the Pallas TPU interpreter lowers pathologically
# slowly (>10 min, ~16 GB for one small kernel). 2 still exercises the
# amortized multi-step path (steps_n) while keeping the suite fast; the
# semantics are sync-count-invariant (`active` is self-gating), which
# test_pallas lane-exactness checks rely on.
from path_tracer_tpu.ops.pallas import trace_kernel as _tk  # noqa: E402
from path_tracer_tpu.ops.pallas import trace_v2 as _tv2  # noqa: E402

_tv2.SYNC_EVERY_V3 = 2
_tk.WHILE_UNROLL = 2

# The portal v2 scheduler's parked-path buffers multiply the cheap
# kernel's loop-carried state; the interpreter compiles/executes that
# pathologically slowly at the production depth. 1 still exercises every
# park/unpark path (park, stall-when-full, ready-reactivation).
from path_tracer_tpu.ops.pallas import portal as _portal  # noqa: E402

_portal.PARK_K = 1


@pytest.fixture(scope="session")
def scenes_dir():
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "scenes")


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def all_scenes(repo_root):
    import path_tracer_tpu as pt

    old = os.getcwd()
    os.chdir(repo_root)  # MeshFile paths are repo-relative
    try:
        ids = pt.load_scene_ids("scenes")
        out = {sid: pt.load_scene(sid, "scenes") for sid in ids}
    finally:
        os.chdir(old)
    return out


@pytest.fixture()
def rng_np():
    return np.random.default_rng(1234)
