"""Aggregate cache ledger (whisper_git_tpu/ledger.py, VERDICT r4 weak
#4): one registry every bounded cache reports into, sized snapshots,
and cap-violation detection the soak gates on."""

import numpy as np

from whisper_git_tpu import ledger


def test_snapshot_covers_known_caches():
    snap = ledger.snapshot()
    for name in ("compose.group", "compose.slab", "compose.plan",
                 "frame.chrome", "raster.win_dev", "layout.subtree",
                 "ui.el_memo", "scene.subtree_cache", "atlas.measure"):
        assert name in snap, f"{name} not registered"
        assert set(snap[name]) == {"entries", "mb", "cap"}


def test_violation_detection_fires_over_cap():
    d = {i: np.zeros(8, np.uint8) for i in range(10)}
    ledger.register_dict("test.overfull", d, cap=4)
    try:
        viols = ledger.violations()
        assert any(v.startswith("test.overfull:") for v in viols), viols
        # ...and not at exactly cap+1 (eviction leaves cap+1 after an
        # insert in the `while len > cap` callers).
        for k in list(d)[:5]:
            del d[k]
        assert not any(v.startswith("test.overfull:")
                       for v in ledger.violations())
    finally:
        ledger._REGISTRY.pop("test.overfull", None)


def test_sizes_reflect_array_payloads():
    d = {"k": np.zeros((100, 100, 4), np.float32)}   # 160 KB
    ledger.register_dict("test.sized", d, cap=8)
    try:
        snap = ledger.snapshot()
        assert snap["test.sized"]["entries"] == 1
        assert 0.1 <= snap["test.sized"]["mb"] <= 0.2
    finally:
        ledger._REGISTRY.pop("test.sized", None)


def test_render_populates_scene_caches():
    from whisper_git_tpu.render.renderer import get_renderer
    from whisper_git_tpu.ui import column, rect, text
    from whisper_git_tpu.ui.theme import DARK

    r = get_renderer()
    ui = column(rect(text("ledger probe", color=DARK.text),
                     fill=DARK.surface, width="fill", height=30),
                width="fill", height="fill", fill=DARK.background)
    root = r.layout(ui, (128, 64))
    r.compile(root, (128, 64), DARK.background)
    snap = ledger.snapshot()
    assert snap["scene.text_cache"]["entries"] >= 1
    assert snap.get("jax.live_arrays", {}).get("entries", 0) >= 0
