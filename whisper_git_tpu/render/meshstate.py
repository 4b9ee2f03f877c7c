"""Render-mesh state: which `jax.sharding.Mesh` (if any) the production
frame pipeline shards over.

The steady-state frame paths (render/frame.py device-resident cache,
render/compose.py layer compose) consult this holder every frame; when a
mesh is set, their tile rasterization runs under `jax.shard_map` with the
tile axis sharded across every mesh device and command tables/atlases
replicated, and the compose blend carries a row-sharding constraint (XLA
inserts the collectives). `parallel.mesh` re-exports the setters as the
public API; `Renderer.__init__` auto-installs a mesh when the process
sees more than one accelerator chip (reference analog: the app picking
its GPU at startup, src/host.rs:558-606).

Kept import-light (no jax at module load) so render/* can import it
without cycles through parallel/*.
"""

from __future__ import annotations

_RENDER_MESH = [None]


def set_render_mesh(mesh) -> None:
    """Install (or clear, with None) the mesh the frame pipeline shards
    over. Takes effect on the next rendered frame — the jitted frame
    functions key on the mesh as a static argument."""
    _RENDER_MESH[0] = mesh


def get_render_mesh():
    return _RENDER_MESH[0]


def maybe_auto_mesh():
    """Install a (1, n) render mesh over all same-platform accelerator
    devices when more than one is visible. WGIT_MESH=0 disables;
    WGIT_MESH=<int> forces a device count (used by tests on the virtual
    CPU mesh, where auto mode stays off — 8 virtual CPU devices are a
    validation harness, not a performance win)."""
    import os

    want = os.environ.get("WGIT_MESH", "auto")
    if want in ("0", "off", "none", ""):
        return None
    import jax

    devices = jax.devices()
    if want == "auto":
        if jax.default_backend() == "cpu" or len(devices) < 2:
            return None
        n = len(devices)
    else:
        try:
            n = min(int(want), len(devices))
        except ValueError:
            return None
    if n < 2:
        return None
    import numpy as np
    from jax.sharding import Mesh

    mesh = Mesh(np.array(devices[:n]).reshape(1, n), ("dp", "sp"))
    set_render_mesh(mesh)
    return mesh
