"""Command-palette tests: fuzzy matcher ranking, registry route validity
(every command must resolve to a real `_act_*` handler), and the full
keyboard flow (Ctrl+P → type → Enter) driven against a real temp repo.

The palette is a rebuild-original feature (the reference lists it as
Planned in docs/ux-design-2026-02.md:50); these tests pin its contract.
"""

from whisper_git_tpu.app.palette import (
    MAX_RESULTS, PaletteCommand, PaletteState, build_commands,
    filter_commands, fuzzy_score)
from whisper_git_tpu.app.repo_tab import RepoTab
from whisper_git_tpu.app.ui_app import WhisperApp
from whisper_git_tpu.ui.layout import layout_tree


def make_app(path) -> WhisperApp:
    tab = RepoTab.open(path)
    tab.refresh_sync()
    return WhisperApp.with_tabs([tab])


# -- fuzzy matcher -----------------------------------------------------------

def test_fuzzy_no_match_returns_none():
    assert fuzzy_score("xyz", "Fetch") is None


def test_fuzzy_empty_query_matches_everything():
    assert fuzzy_score("", "anything") == (0.0, [])


def test_fuzzy_prefix_beats_scattered():
    prefix = fuzzy_score("fet", "Fetch")
    scattered = fuzzy_score("fet", "Force pull either way extended")
    assert prefix is not None and scattered is not None
    assert prefix[0] > scattered[0]


def test_fuzzy_word_start_bonus():
    # "sp" at word starts ("Stash Push") should beat mid-word hits.
    word_start = fuzzy_score("sp", "Stash Push")
    mid_word = fuzzy_score("sp", "despair")
    assert word_start[0] > mid_word[0]


def test_fuzzy_positions_are_subsequence():
    score, pos = fuzzy_score("cmt", "Commit")
    assert pos == sorted(pos)
    assert [c.lower() for c in "cmt"] == ["commit"[i].lower() for i in pos]


def test_filter_ranks_and_caps():
    cmds = [PaletteCommand(f"Command {i}", f"noop:{i}") for i in range(20)]
    cmds.append(PaletteCommand("Fetch", "fetch"))
    out = filter_commands(cmds, "fetch")
    assert out[0][0].label == "Fetch"
    assert len(filter_commands(cmds, "")) == MAX_RESULTS
    assert filter_commands(cmds, "zzzz") == []


def test_filter_stable_order_for_ties():
    cmds = [PaletteCommand("Push", "push"),
            PaletteCommand("Push", "push-2")]
    out = filter_commands(cmds, "push")
    assert [c.route for c, _ in out] == ["push", "push-2"]


# -- registry validity --------------------------------------------------------

def test_every_command_route_has_a_handler(temp_repo, git, tmp_path):
    """Each palette route's head must map to an `_act_*` method — a palette
    entry that lands in the Unhandled-action toast is a bug."""
    wt = tmp_path / "wt-pal"
    git(temp_repo, "worktree", "add", "-b", "pal-branch", str(wt))
    git(temp_repo, "branch", "other-branch")
    app = make_app(temp_repo)
    tab = app.current()
    tab.select_commit(tab.commits[0].oid)
    cmds = build_commands(app)
    assert len(cmds) > 20
    for cmd in cmds:
        head = cmd.route.partition(":")[0]
        handler = getattr(app, f"_act_{head.replace('-', '_')}", None)
        assert handler is not None, f"no handler for route {cmd.route!r}"


def test_dynamic_entries_cover_branches_worktrees_tabs(temp_repo, git,
                                                       tmp_path):
    wt = tmp_path / "wt-dyn"
    git(temp_repo, "worktree", "add", "-b", "dyn-branch", str(wt))
    git(temp_repo, "branch", "feature-x")
    app = make_app(temp_repo)
    labels = [c.label for c in build_commands(app)]
    assert "Checkout: feature-x" in labels
    assert any(label.startswith("Switch Worktree:") for label in labels)
    # The current branch must NOT appear as a checkout target.
    assert "Checkout: main" not in labels


# -- keyboard flow ------------------------------------------------------------

def test_ctrl_p_opens_and_escape_closes(temp_repo):
    app = make_app(temp_repo)
    app.on_key("p", ctrl=True)
    assert app.palette is not None
    assert app.palette.commands  # snapshot taken at open
    app.on_key("Escape")
    assert app.palette is None


def test_type_filter_enter_runs_command(temp_repo):
    app = make_app(temp_repo)
    before = app.config.show_shortcut_bar
    app.on_key("k", ctrl=True)  # alternate open chord
    for ch in "toggle shortcut":
        app.on_key(ch)
    assert app.palette.query == "toggle shortcut"
    top = app.palette.matches()[0][0]
    assert top.route == "toggle-shortcut-bar"
    app.on_key("Enter")
    assert app.palette is None
    assert app.config.show_shortcut_bar == (not before)


def test_palette_navigation_and_backspace(temp_repo):
    app = make_app(temp_repo)
    app.on_key("p", ctrl=True)
    app.on_key("Down")
    assert app.palette.selected == 1
    app.on_key("Up")
    app.on_key("Up")  # clamps at 0
    assert app.palette.selected == 0
    app.on_key("x")
    app.on_key("Backspace")
    assert app.palette.query == ""


def test_palette_checkout_via_enter(temp_repo, git):
    git(temp_repo, "branch", "pal-feature")
    app = make_app(temp_repo)
    app.on_key("p", ctrl=True)
    for ch in "pal-feature":
        app.on_key(ch)
    app.on_key("Enter")
    assert app.palette is None
    repo = app.current().repo
    assert repo.current_branch() == "pal-feature"


def test_palette_run_route_via_mouse(temp_repo):
    app = make_app(temp_repo)
    app.on_key("p", ctrl=True)
    app.palette.query = "settings"
    app.handle_action("palette-run:0")
    assert app.palette is None
    assert app.modal is not None and app.modal[0] == "settings"
    # Scrim click path.
    app.modal = None
    app.on_key("p", ctrl=True)
    app.handle_action("close-palette")
    assert app.palette is None


def test_palette_search_history_command(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("search-history")
    assert app.current().search_active
    assert app.focused_input == "search"


def test_palette_overlay_builds_and_lays_out(temp_repo):
    app = make_app(temp_repo)
    app.on_key("p", ctrl=True)
    app.on_key("f")
    tree = app.build((1280.0, 800.0))
    laid = layout_tree(tree, (1280.0, 800.0))
    # The overlay must be present in the laid-out tree.
    found = []

    def walk(node):
        if node.el.key in ("palette-panel", "palette-query"):
            found.append(node.el.key)
        for ch in node.children:
            walk(ch)

    walk(laid)
    assert "palette-panel" in found and "palette-query" in found


def test_diff_left_right_hscroll(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    tab.select_commit(tab.commits[0].oid)
    app.handle_action(f"select-commit:{tab.commits[0].oid}")
    app.diff_open = True
    assert tab.diff_hscroll == 0.0
    app.on_key("Right")
    assert tab.diff_hscroll == 60.0
    app.on_key("Left")
    app.on_key("Left")  # clamps at 0
    assert tab.diff_hscroll == 0.0
