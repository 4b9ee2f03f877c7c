"""Frame-loop soak: hundreds of frames of randomized interaction through
the full pipeline (build → layout → compile → device render) must not
throw, must keep every host cache bounded, and must stay deterministic
(replaying a state byte-for-byte)."""

import numpy as np


def test_render_soak_random_interaction(temp_repo, git):
    rng = np.random.RandomState(7)
    for i in range(25):
        if i % 9 == 4:
            git(temp_repo, "checkout", "-q", "-b", f"b{i}")
            git(temp_repo, "commit", "--allow-empty", "-m", f"branch {i}")
            git(temp_repo, "checkout", "-q", "main")
            git(temp_repo, "merge", "-q", "--no-ff", "-m", f"merge b{i}",
                f"b{i}")
        else:
            git(temp_repo, "commit", "--allow-empty", "-m",
                f"soak commit {i} with ünïcode ≥ and text")

    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.render.rasterizer import render_scene_device
    from whisper_git_tpu.render.renderer import get_renderer
    from whisper_git_tpu.ui.runner import Runner
    from whisper_git_tpu.ui.theme import DARK

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    renderer = get_renderer()
    runner = Runner(app, measurer=renderer.measurer)
    W, H = 512, 320

    def frame():
        app.before_build()
        root = runner.prepare((float(W), float(H)))
        scene = renderer.compile(root, (W, H), DARK.background)
        return render_scene_device(scene, renderer.font_tex_device(),
                                   renderer.image_atlas_device())

    img = None
    for i in range(60):
        kind = rng.randint(0, 5)
        x = float(rng.randint(0, W))
        y = float(rng.randint(0, H))
        if kind == 0:
            app.on_scroll(float(rng.randint(-120, 120)), x, y)
        elif kind == 1:
            runner.pointer_move(x, y)
        elif kind == 2:
            runner.pointer_down(x, y, button="left")
            runner.pointer_up()
        elif kind == 3 and app.modal is None and app.context_menu is None:
            runner.pointer_down(x, y, button="right")
            runner.pointer_up()
        else:
            app.handle_action("escape")
        img = frame()
    assert img is not None and np.asarray(img).shape == (H, W, 4)

    # Host caches stay bounded (their own guards, exercised under churn).
    c = renderer.compiler
    assert len(c._text_cache) <= 50_000
    assert len(c._subtree_cache) <= 20_000
    assert len(c._window_cache) <= 512
    for atlas in (renderer.regular, renderer.bold):
        assert len(atlas._measure_cache) <= 100_000

    # Determinism: quiesce EVERY time-dependent surface — focused-input
    # caret blink and toast fade are wall-clock driven, so a frame pair
    # straddling a blink/fade boundary would differ legitimately — then
    # render the same app state twice → byte-identical frames (no hidden
    # per-frame mutation).
    app.handle_action("escape")
    app.handle_action("escape")
    app.focused_input = ""
    app.toasts.clear()
    app.context_menu = None
    app.modal = None
    runner.pointer_move(-100.0, -100.0)  # hover nothing
    a = np.asarray(frame())
    b = np.asarray(frame())
    assert (a == b).all()
    tab.stop_workers()
