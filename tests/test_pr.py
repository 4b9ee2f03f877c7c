"""Pull-request integration (beyond-reference: Deferred in the
reference's docs/user_needs.md): payload parsers, branch mapping,
create-PR URLs, receiver draining, and the sidebar/header/menu surface.
"""

from __future__ import annotations

import queue

from whisper_git_tpu.services import pr
from whisper_git_tpu.services.pr import (
    PrResult,
    PullRequestInfo,
    by_branch,
    create_pr_url,
    parse_github_prs,
    parse_gitlab_mrs,
)

GH_PAYLOAD = [
    {"number": 42, "title": "Add feature", "state": "open", "draft": False,
     "html_url": "https://github.com/o/r/pull/42",
     "user": {"login": "alice"},
     "head": {"ref": "feature/x"}, "base": {"ref": "main"}},
    {"number": 41, "title": "WIP thing", "state": "open", "draft": True,
     "html_url": "https://github.com/o/r/pull/41",
     "user": {"login": "bob"},
     "head": {"ref": "wip"}, "base": {"ref": "main"}},
]

GL_PAYLOAD = [
    {"iid": 7, "title": "Fix bug", "state": "opened", "draft": False,
     "web_url": "https://gitlab.com/g/p/-/merge_requests/7",
     "author": {"username": "carol"},
     "source_branch": "bugfix", "target_branch": "main"},
]


def test_parse_github_prs():
    prs = parse_github_prs(GH_PAYLOAD)
    assert len(prs) == 2
    assert prs[0].number == 42 and prs[0].source_branch == "feature/x"
    assert prs[0].target_branch == "main" and prs[0].author == "alice"
    assert not prs[0].draft and prs[1].draft
    assert prs[0].provider == "github"


def test_parse_github_prs_malformed():
    assert parse_github_prs({"not": "a list"}) == []
    assert parse_github_prs([{}])[0].number == 0


def test_parse_gitlab_mrs():
    mrs = parse_gitlab_mrs(GL_PAYLOAD)
    assert len(mrs) == 1
    assert mrs[0].number == 7 and mrs[0].source_branch == "bugfix"
    assert mrs[0].state == "open" and mrs[0].provider == "gitlab"
    assert mrs[0].author == "carol"


def test_gitlab_wip_fallback():
    mrs = parse_gitlab_mrs([{"iid": 1, "work_in_progress": True,
                             "source_branch": "b", "target_branch": "m"}])
    assert mrs[0].draft


def test_by_branch_first_wins():
    prs = parse_github_prs(GH_PAYLOAD)
    dup = PullRequestInfo("github", 99, "older", "feature/x", "main", "u")
    mapping = by_branch(prs + [dup])
    assert mapping["feature/x"].number == 42
    assert set(mapping) == {"feature/x", "wip"}


def test_create_pr_url_github():
    url = create_pr_url("git@github.com:o/r.git", "feature/x", base="main")
    assert url == "https://github.com/o/r/compare/main...feature/x?expand=1"
    url2 = create_pr_url("https://github.com/o/r", "feature/x")
    assert url2 == "https://github.com/o/r/compare/feature/x?expand=1"


def test_create_pr_url_gitlab():
    url = create_pr_url("git@gitlab.com:g/p.git", "bugfix")
    assert url is not None
    assert url.startswith("https://gitlab.com/g/p/-/merge_requests/new?")
    assert "source_branch%5D=bugfix" in url
    self_hosted = create_pr_url("git@code.example.com:g/p.git", "b",
                                known_gitlab_hosts=["code.example.com"])
    assert self_hosted is not None and "code.example.com" in self_hosted


def test_create_pr_url_unknown_forge():
    assert create_pr_url("git@bitbucket.org:o/r.git", "b") is None


class _Tab:
    def __init__(self):
        self.pr_by_branch = {}
        self.pr_receivers = []
        self.pr_error = None


def _done_queue(result):
    q: "queue.Queue" = queue.Queue(maxsize=1)
    q.put(result)
    return q


def test_drain_receivers_folds_and_replaces_per_provider():
    tab = _Tab()
    tab.pr_by_branch = {
        "old-gh": PullRequestInfo("github", 1, "t", "old-gh", "main", "u"),
        "gl": PullRequestInfo("gitlab", 2, "t", "gl", "main", "u"),
    }
    tab.pr_receivers = [_done_queue(
        PrResult("github", prs=parse_github_prs(GH_PAYLOAD)))]
    assert pr.drain_receivers(tab)
    # github entries replaced wholesale (closed PR pill drops), gitlab kept
    assert "old-gh" not in tab.pr_by_branch
    assert tab.pr_by_branch["gl"].number == 2
    assert tab.pr_by_branch["feature/x"].number == 42
    assert tab.pr_receivers == []


def test_drain_receivers_error_keeps_data():
    tab = _Tab()
    tab.pr_by_branch = {"b": PullRequestInfo("github", 5, "t", "b", "m", "u")}
    tab.pr_receivers = [_done_queue(PrResult("github", error="boom"))]
    assert pr.drain_receivers(tab)
    assert tab.pr_by_branch["b"].number == 5
    assert tab.pr_error == "boom"


def test_drain_receivers_pending_stays():
    tab = _Tab()
    tab.pr_receivers = [queue.Queue(maxsize=1)]
    assert not pr.drain_receivers(tab)
    assert len(tab.pr_receivers) == 1


# -- UI surface ---------------------------------------------------------------

def _app_with_pr(temp_repo_path):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(str(temp_repo_path))
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])
    branch = tab.current_branch
    tab.pr_by_branch[branch] = PullRequestInfo(
        "github", 42, "Add feature", branch, "main",
        "https://github.com/o/r/pull/42")
    return app, tab, branch


def _flatten(node, acc):
    """Flatten a laid-out tree (layout materializes virtualized rows)."""
    acc.append(node.el)
    for c in node.children:
        _flatten(c, acc)
    return acc


def test_sidebar_pr_pill_and_header_chip(temp_repo):
    from whisper_git_tpu.ui.layout import layout_tree

    app, tab, branch = _app_with_pr(temp_repo)
    root = layout_tree(app.build((1280, 800)), (1280, 800))
    els = _flatten(root, [])
    texts = [getattr(e, "text", "") for e in els]
    assert any(t == "#42" for t in texts), "sidebar PR pill missing"
    assert any("PR #42" in t for t in texts), "header PR chip missing"
    routes = [getattr(e, "route", None) for e in els]
    assert "open-url:https://github.com/o/r/pull/42" in routes


def test_branch_menu_open_pr_entry(temp_repo):
    app, tab, branch = _app_with_pr(temp_repo)
    app.handle_action(f"menu-branch:{branch}", 100, 100)
    labels = [i.label for i in app.context_menu.items]
    assert any("Open Pull Request #42" in l for l in labels)
    assert not any("Create Pull Request" in l for l in labels)


def test_branch_menu_create_pr_entry(temp_repo, git):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(str(temp_repo))
    tab.refresh_sync()
    tab.remote_urls = {"origin": "git@github.com:o/r.git"}
    app = WhisperApp.with_tabs([tab])
    app.handle_action(f"menu-branch:{tab.current_branch}", 100, 100)
    labels = [i.label for i in app.context_menu.items]
    assert any("Create Pull Request" in l for l in labels)


def test_create_pr_action_builds_url(temp_repo, monkeypatch):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(str(temp_repo))
    tab.refresh_sync()
    tab.remote_urls = {"origin": "git@github.com:o/r.git"}
    app = WhisperApp.with_tabs([tab])
    opened = []
    monkeypatch.setattr(app, "_act_open_url",
                        lambda arg, x, y: opened.append(arg))
    app.handle_action("open-create-pr:topic")
    assert opened == ["https://github.com/o/r/compare/topic?expand=1"]


def test_ci_poll_spawns_pr_fetch(temp_repo, monkeypatch):
    """trigger_fetch queues a PR receiver alongside the CI receiver."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.services import ci_poll

    tab = RepoTab.open(str(temp_repo))
    tab.refresh_sync()
    tab.remote_urls = {"origin": "https://github.com/o/r.git"}
    app = WhisperApp.with_tabs([tab])
    monkeypatch.setattr(
        "whisper_git_tpu.services.github.fetch_ci_status_async",
        lambda *a, **k: queue.Queue(maxsize=1))
    monkeypatch.setattr(
        "whisper_git_tpu.services.pr.fetch_prs_async",
        lambda *a, **k: queue.Queue(maxsize=1))
    started = ci_poll.trigger_fetch(app, tab)
    assert started == 1
    assert len(tab.ci_receivers) == 1
    assert len(tab.pr_receivers) == 1
