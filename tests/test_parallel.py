"""Mesh-sharded rendering tests on the 8-virtual-device CPU mesh: the
sharded output must be bit-identical to the single-chip rasterizer."""

import numpy as np
import pytest

from whisper_git_tpu.parallel.mesh import make_mesh, render_scene_sharded
from whisper_git_tpu.ui import column, path, rect, stack, text
from whisper_git_tpu.ui.theme import DARK


@pytest.fixture(scope="module")
def renderer():
    from whisper_git_tpu.render.renderer import get_renderer
    return get_renderer()


def _scene(renderer, w=256, h=128):
    ui = stack(
        column(
            rect(text("Sharded render", bold=True, color=DARK.text_bright),
                 fill=DARK.surface_raised, radius=6, padding=(6, 10, 6, 10),
                 width="fill", height=32),
            rect(path([("vline", 16, 0, 60, 2.0, (0.4, 0.6, 0.9, 1.0)),
                       ("circle", 16, 30, 5.0, (0.4, 0.6, 0.9, 1.0))]),
                 text("hello tiles", color=DARK.text),
                 flex=1, width="fill", fill=DARK.background,
                 padding=(8, 8, 8, 40)),
            width="fill", height="fill"),
        width="fill", height="fill", fill=DARK.background)
    root = renderer.layout(ui, (w, h))
    return renderer.compile(root, (w, h), DARK.background)


def test_sharded_matches_single_chip(renderer):
    import jax
    scene = _scene(renderer)
    from whisper_git_tpu.render.rasterizer import render_scene
    single = render_scene(scene, renderer.font_tex)
    mesh = make_mesh(8, dp=1)
    sharded = render_scene_sharded(scene, renderer.font_tex, mesh)
    assert sharded.shape == single.shape
    diff = np.abs(sharded.astype(int) - single.astype(int))
    # ±4/255: the glyph sampler runs its matmuls in bf16 (MXU path) and
    # XLA fuses/orders them differently under shard_map vs vmap.
    assert diff.max() <= 4


def test_sharded_2d_mesh(renderer):
    scene = _scene(renderer, w=384, h=128)
    from whisper_git_tpu.render.rasterizer import render_scene
    single = render_scene(scene, renderer.font_tex)
    mesh = make_mesh(8, dp=2)  # (2, 4) mesh used jointly for tiles
    sharded = render_scene_sharded(scene, renderer.font_tex, mesh)
    diff = np.abs(sharded.astype(int) - single.astype(int))
    assert diff.max() <= 4  # bf16 sampling tolerance (see above)
