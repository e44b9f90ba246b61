"""Multi-host execution proof: a REAL 2-process jax.distributed CPU cluster
(tests/_dist_child.py per rank) rendering one sharded frame.

Covers survey §5 "distributed communication backend": cross-process device
view, scene-digest consistency gate (both the pass and the catch),
shard_map collectives spanning processes, multi-host framebuffer assembly,
and exact odd-spp accounting across sp shards. The single-process
render_sharded paths are covered in tests/test_parallel.py.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CHILD = os.path.join(_ROOT, "tests", "_dist_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_render(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # fresh CPU-only jax runtimes: no axon registration (gated on this var),
    # no inherited platform pin (the child sets its own)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache")
    )

    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"

    img0 = np.load(tmp_path / "img_0.npy")
    img1 = np.load(tmp_path / "img_1.npy")
    # every host assembles the identical global frame
    np.testing.assert_array_equal(img0, img1)
    assert np.isfinite(img0).all()
    assert img0.max() > 0.1  # a real render, not zeros

    # cross-topology expectation check: the same config on the in-process
    # 8-device virtual mesh (restricted to 4 devices, dp=2 x sp=2 like the
    # cluster) must agree in expectation; RNG streams are keyed by
    # (pass, dp, sp) so with identical mesh logicals the image is identical
    import path_tracer_tpu as pt
    from path_tracer_tpu.parallel.mesh import render_sharded
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    scene = pt.load_scene("cornell", os.path.join(_ROOT, "scenes"))
    cfg = RenderConfig(
        samples_per_pixel=5, resolution=Resolution(16, 24),
        backend="fast", seed=3,
    )
    done = render_sharded(
        scene, cfg, num_devices=4, sample_parallel=2,
        out_dir=None, verbose=False,
    )
    np.testing.assert_allclose(done.image.pixels, img0, atol=1e-5)
