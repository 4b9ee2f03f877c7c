"""The fused Pallas tile kernel must visually match the XLA scan path.

The Pallas path is TPU-only in production (`rasterizer._use_pallas`); here
it runs in interpreter mode on CPU so the kernel logic — per-tile
occupancy loops, VMEM atlas sampling, planar compositing — is exercised
by the suite without TPU hardware.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_scene():
    import __graft_entry__ as g

    renderer, scene = g._compiled_scene(256, 128)
    return renderer, scene


def _render_both(renderer, scene):
    import jax
    import jax.numpy as jnp

    from whisper_git_tpu.render import pallas_raster as PR
    from whisper_git_tpu.render import rasterizer as R

    fused, meta, ty, tx, win_list = R.pack_scene(scene)
    T = ty * tx
    wins = tuple(jnp.asarray(b) for _, _, b in win_list)
    layer_data, layer_sig = R.unpack_layers(jnp.asarray(fused), wins, meta,
                                            T)
    font = jnp.asarray(renderer.font_tex_device())
    atlas = jnp.asarray(renderer.image_atlas_device())
    bg = tuple(float(c) for c in scene.background[:3])

    tiles = R._render_tiles_impl(layer_data, font, atlas, bg, ty, tx,
                                 layer_sig)
    img_x = np.asarray(tiles.reshape(ty, tx, R.TILE_H, R.TILE_W, 4)
                       .transpose(0, 2, 1, 3, 4)
                       .reshape(ty * R.TILE_H, tx * R.TILE_W, 4))
    img_x = np.clip(img_x[:scene.height, :scene.width] * 255.0 + 0.5,
                    0, 255).astype(np.uint8)

    font_cells, font_cols = PR.cellify(font.astype(jnp.bfloat16))
    image_cells, img_cols = PR.cellify(atlas.astype(jnp.bfloat16),
                                       channels=4)
    tiles_p = PR.render_tiles_pallas(
        layer_data, font_cells, font_cols, image_cells, img_cols, bg,
        ty, tx, layer_sig, interpret=True)
    img_p = np.asarray(PR.assemble_planar(tiles_p, ty, tx,
                                          scene.height, scene.width))
    return img_x, img_p


def test_pallas_matches_xla(small_scene):
    renderer, scene = small_scene
    img_x, img_p = _render_both(renderer, scene)
    assert img_x.shape == img_p.shape == (128, 256, 4)
    diff = np.abs(img_x.astype(int) - img_p.astype(int))
    # bf16 sampling order differences allow ±few units; anything larger
    # would be a geometry/compositing bug.
    assert diff.max() <= 8
    assert (diff > 2).mean() < 0.01


def test_pallas_empty_scene():
    """No commands at all → background-only frame, no division by zero."""
    import jax.numpy as jnp

    from whisper_git_tpu.render import pallas_raster as PR
    from whisper_git_tpu.render import rasterizer as R
    from whisper_git_tpu.render.scene import Scene

    scene = Scene(layers=[], width=128, height=64,
                  background=(0.1, 0.2, 0.3, 1.0),
                  image_atlas=np.zeros((64, 64, 4), np.uint8))
    fused, meta, ty, tx, win_list = R.pack_scene(scene)
    wins = tuple(jnp.asarray(b) for _, _, b in win_list)
    layer_data, layer_sig = R.unpack_layers(jnp.asarray(fused), wins, meta,
                                            ty * tx)
    font = jnp.zeros((2, 64, 64), jnp.bfloat16)
    atlas = jnp.zeros((2, 4, 64, 64), jnp.bfloat16)
    tiles = PR.render_tiles_pallas(layer_data, font, 2, atlas, 2,
                                   (0.1, 0.2, 0.3), ty, tx, layer_sig,
                                   interpret=True)
    img = np.asarray(PR.assemble_planar(tiles, ty, tx, 64, 128))
    assert img.shape == (64, 128, 4)
    assert abs(int(img[0, 0, 0]) - int(0.1 * 255 + 0.5)) <= 1
    assert abs(int(img[0, 0, 2]) - int(0.3 * 255 + 0.5)) <= 1
