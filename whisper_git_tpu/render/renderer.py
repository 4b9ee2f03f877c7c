"""Renderer facade: atlases + scene compiler + rasterizer in one object.

The per-frame path (the analog of the reference's
Runner::prepare + render, host.rs:471-516):
  layout_tree → SceneCompiler.compile → render_scene → (H, W, 4) u8.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ui.el import El
from ..ui.layout import LayoutNode, layout_tree
from .atlas import AtlasMeasurer, build_atlas
from .rasterizer import render_scene
from .scene import Scene, SceneCompiler


def enable_persistent_compile_cache() -> None:
    """JAX persistent compilation cache: app launches and repeat bench
    runs skip recompiling the frame kernels entirely — cold start drops
    from ~6-12 s of tunnel compiles to ~2 s. WGIT_JAX_CACHE=0 disables;
    safe no-op on jax versions without the flags."""
    import os

    if os.environ.get("WGIT_JAX_CACHE") == "0":
        return
    import jax

    if jax.default_backend() == "cpu":
        # CPU compiles are cheap, and reloading CPU AOT executables is
        # machine-feature-sensitive (XLA warns of possible SIGILL when
        # the compile and execution hosts differ). The cache exists to
        # amortize accelerator-tunnel compiles only.
        return
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "whisper-git-tpu", "jax-cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def _apply_device_override() -> None:
    """WGIT_DEVICE=cpu|tpu|… picks the accelerator backend (the analog of
    the reference's WHISPER_GPU device override, host.rs:567). Best-effort:
    only effective before the first jax dispatch."""
    import os

    want = os.environ.get("WGIT_DEVICE")
    if not want:
        return
    try:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
        import sys

        print(f"wgit: using device platform {jax.devices()[0].platform} "
              f"({jax.devices()[0].device_kind})", file=sys.stderr)
    except Exception as exc:  # fall back to the default platform
        import sys

        print(f"wgit: WGIT_DEVICE={want!r} not usable: {exc}",
              file=sys.stderr)


class Renderer:
    def __init__(self):
        _apply_device_override()
        enable_persistent_compile_cache()
        from .meshstate import maybe_auto_mesh

        # Multi-chip: shard the production frame pipeline over every
        # visible accelerator chip (no-op single-chip / on CPU; see
        # render/meshstate.py and parallel/mesh.py).
        maybe_auto_mesh()
        self.regular = build_atlas(bold=False)
        self.bold = build_atlas(bold=True)
        rt, bt = self.regular.texture, self.bold.texture
        w = max(rt.shape[1], bt.shape[1])

        def pad(t):
            if t.shape[1] < w:
                t = np.pad(t, ((0, 0), (0, w - t.shape[1])),
                           constant_values=0)
            return t

        self.font_tex = np.concatenate([pad(rt), pad(bt)], axis=0)
        self.compiler = SceneCompiler(self.regular, self.bold,
                                      bold_v_offset=rt.shape[0])
        self.measurer = AtlasMeasurer(self.regular, self.bold)
        # Device-resident copies — transferred once, reused every frame
        # (per-frame data crosses as two packed blobs; see rasterizer).
        self._font_tex_dev = None
        self._image_atlas_dev = None
        self._image_atlas_version = -1

    def font_tex_device(self):
        import jax.numpy as jnp

        if self._font_tex_dev is None:
            self._font_tex_dev = jnp.asarray(self.font_tex)
        return self._font_tex_dev

    def image_atlas_device(self):
        import jax.numpy as jnp

        if (self._image_atlas_dev is None
                or self._image_atlas_version != self.compiler.atlas_version):
            self._image_atlas_dev = jnp.asarray(self.compiler.image_atlas)
            self._image_atlas_version = self.compiler.atlas_version
        return self._image_atlas_dev

    def layout(self, el: El, viewport: tuple[float, float]) -> LayoutNode:
        return layout_tree(el, viewport, self.measurer)

    def compile(self, root: LayoutNode, viewport: tuple[int, int],
                background: tuple) -> Scene:
        return self.compiler.compile(root, viewport, background)

    def render(self, el: El, viewport: tuple[int, int],
               background: Optional[tuple] = None) -> np.ndarray:
        from ..ui.theme import DARK

        bg = background or DARK.background
        root = self.layout(el, viewport)
        scene = self.compile(root, viewport, bg)
        return render_scene(scene, self.font_tex_device(),
                            self.image_atlas_device())


_RENDERER: Optional[Renderer] = None


def get_renderer() -> Renderer:
    global _RENDERER
    if _RENDERER is None:
        _RENDERER = Renderer()
    return _RENDERER


def save_png(img: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(img, "RGBA").save(path)
