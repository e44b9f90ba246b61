"""Render daemon: a resident process serving render jobs over a unix socket.

The reference is a desktop app; its "serving" story is the GUI worker
(main.rs:340-401). On TPU the equivalent production concern is process
startup: a fresh CLI process pays ~10 s of jax import plus seconds of
compile-cache loading through the remote tunnel, while a warm process
renders the 1000-spp headline frame in ~2.6 s. The daemon keeps one
process (and its compiled kernels) resident; clients submit jobs and
stream progress over a line-delimited JSON protocol:

    client → {"scene": "cornell", "spp": 100, "res_y": 300,
              "checkpoint": "ck.npz", ...}\n
    server → {"progress": 0.25}\n ...
    server → {"done": true, "ppm_path": ..., "duration": ...,
              "msamples_per_sec": ..., "mrays_per_sec": ...}\n
    or     → {"error": "..."}\n

Jobs run serially (the chip is single-tenant); a job failure is reported
to its client and the daemon keeps serving (failure isolation). The
client side (`submit`, used by cli.py) deliberately imports neither jax
nor the framework — connecting costs milliseconds.
"""

from __future__ import annotations

import json
import os
import socket
import socketserver
import threading

DEFAULT_SOCKET = os.path.join(
    os.path.expanduser("~"), ".cache", "pt_tpu", "daemon.sock"
)


# --------------------------------------------------------------------------
# client (no jax / framework imports — keep startup at milliseconds)
# --------------------------------------------------------------------------

def submit(job: dict, socket_path: str = DEFAULT_SOCKET, progress=None,
           timeout: float | None = None):
    """Send a render job to a running daemon; returns the final reply dict.

    progress: optional callback receiving each {"progress": f} message.
    Raises ConnectionError if no daemon is listening.
    """
    try:
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.settimeout(timeout)
        conn.connect(socket_path)
    except OSError as e:
        raise ConnectionError(f"no render daemon at {socket_path}: {e}") from e
    with conn:
        conn.sendall(json.dumps(job).encode() + b"\n")
        buf = b""
        while True:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError("daemon closed the connection mid-job")
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                msg = json.loads(line)
                if "progress" in msg and progress is not None:
                    progress(msg["progress"])
                if "done" in msg or "error" in msg:
                    return msg


def daemon_running(socket_path: str = DEFAULT_SOCKET) -> bool:
    """True when a daemon accepts connections at socket_path."""
    try:
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.settimeout(0.25)
        conn.connect(socket_path)
        conn.close()
        return True
    except OSError:
        return False


# --------------------------------------------------------------------------
# server
# --------------------------------------------------------------------------

def _render_job(job: dict, send, scene_dir: str, mesh_dir: str,
                out_dir: str) -> dict:
    from path_tracer_tpu.models.scenes import load_scene
    from path_tracer_tpu.render.pipeline import render
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    scene = load_scene(str(job.get("scene", "cornell")), scene_dir, mesh_dir)
    config = RenderConfig(
        samples_per_pixel=int(job.get("spp", 100)),
        resolution=Resolution.from_height(int(job.get("res_y", 300))),
        seed=int(job.get("seed", 0)),
        max_depth=int(job.get("max_depth", 12)),
        backend=str(job.get("backend", "auto")),
        samples_per_pass=int(job.get("samples_per_pass", 0)),
        validate=bool(job.get("validate", True)),
    )
    done = render(
        scene,
        config,
        progress=lambda u: send({"progress": u.progress}),
        progress_snapshots=False,
        out_dir=job.get("out_dir", out_dir),
        checkpoint_path=job.get("checkpoint"),
        checkpoint_every=int(job.get("checkpoint_every", 8)),
        verbose=False,
    )
    s = done.stats
    return {
        "done": True,
        "ppm_path": done.ppm_path,
        "duration": done.duration,
        "cancelled": done.cancelled,
        "num_rays": s.num_rays,
        "msamples_per_sec": s.msamples_per_sec,
        "mrays_per_sec": s.mrays_per_sec,
    }


def warm(specs: list[str], scene_dir: str, mesh_dir: str) -> None:
    """Pre-compile kernels for "scene:res_y" specs so the first real job
    doesn't pay the compile/cache load (renders one full-quota pass — the
    same kernel real jobs reuse — and discards the image)."""
    from path_tracer_tpu.models.scenes import load_scene
    from path_tracer_tpu.render.pipeline import render
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    for spec in specs:
        sid, _, res = spec.partition(":")
        scene = load_scene(sid, scene_dir, mesh_dir)
        # spp = quota cap: the 1-pass kernel is the one real jobs reuse
        render(scene, RenderConfig(samples_per_pixel=256,
                                   resolution=Resolution.from_height(
                                       int(res or 300))),
               out_dir=None, verbose=False)
        print(f"warmed {spec}")


def serve(socket_path: str = DEFAULT_SOCKET, *, scene_dir: str = "scenes",
          mesh_dir: str = "meshes", out_dir: str = "out",
          ready: threading.Event | None = None) -> None:
    """Run the daemon until the process is killed (or a {"shutdown": true}
    job arrives — used by tests)."""
    os.makedirs(os.path.dirname(socket_path), exist_ok=True)
    if os.path.exists(socket_path):
        os.unlink(socket_path)  # stale socket from a dead daemon
    # one render at a time: the chip is single-tenant and kernels are
    # compiled per (scene, resolution) — serialize at the accept level
    lock = threading.Lock()
    shutdown = threading.Event()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            def send(msg: dict):
                self.wfile.write(json.dumps(msg).encode() + b"\n")
                self.wfile.flush()

            try:
                job = json.loads(self.rfile.readline() or b"{}")
                if job.get("shutdown"):
                    send({"done": True})
                    shutdown.set()
                    return
                with lock:
                    send(_render_job(job, send, scene_dir, mesh_dir, out_dir))
            except Exception as e:  # job isolation: report, keep serving
                try:
                    send({"error": f"{type(e).__name__}: {e}"})
                except OSError:
                    pass  # client went away

    class Server(socketserver.ThreadingUnixStreamServer):
        daemon_threads = True

    with Server(socket_path, Handler) as srv:
        if ready is not None:
            ready.set()
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        shutdown.wait()
        srv.shutdown()
    if os.path.exists(socket_path):
        os.unlink(socket_path)


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="path_tracer_tpu.server",
                                description="resident render daemon")
    p.add_argument("--socket", default=DEFAULT_SOCKET)
    p.add_argument("--scene-dir", default="scenes")
    p.add_argument("--mesh-dir", default="meshes")
    p.add_argument("--out-dir", default="out")
    p.add_argument("--warm", default=None, metavar="SPECS",
                   help="comma-separated scene:res_y list to pre-compile "
                        "before serving (e.g. cornell:768,mesh:768)")
    args = p.parse_args(argv)
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "pt_tpu_xla"),
    )
    if args.warm:
        warm(args.warm.split(","), args.scene_dir, args.mesh_dir)
    print(f"render daemon listening on {args.socket}")
    serve(args.socket, scene_dir=args.scene_dir, mesh_dir=args.mesh_dir,
          out_dir=args.out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
