"""Service tests, mirroring the reference's unit batteries: GitHub URL
parsing + run dedupe + HTTP error classification (github.rs:347-461),
GitLab parsing + status mapping + rollups (gitlab.rs:285+), CI rollup core
(ci.rs:145), AI subject/body splitting (ai.rs), config recents
normalization (recent.rs:125+), token store fallback, crash log."""

import os
import time

import pytest

from whisper_git_tpu.services import ai, ci, config as config_mod, crash_log, github, gitlab
from whisper_git_tpu.services.ci import CiCounts, CiProvider, CiRun, CiState, CiStatus


# -- GitHub -----------------------------------------------------------------

def test_github_url_parsing():
    assert github.parse_remote_url("https://github.com/foo/bar.git") == ("foo", "bar")
    assert github.parse_remote_url("https://github.com/foo/bar") == ("foo", "bar")
    assert github.parse_remote_url("git@github.com:foo/bar.git") == ("foo", "bar")
    assert github.parse_remote_url("ssh://git@github.com/foo/bar") == ("foo", "bar")
    assert github.parse_remote_url("https://gitlab.com/foo/bar") is None
    assert github.parse_remote_url("") is None


def _run(name, status, conclusion, run_id, sha):
    return {"name": name, "status": status, "conclusion": conclusion,
            "id": run_id, "head_sha": sha, "html_url": ""}


def test_github_summary_all_pass():
    payload = {"workflow_runs": [_run("ci", "completed", "success", 2, "abc"),
                                 _run("lint", "completed", "success", 3, "abc")]}
    st = github.parse_runs_payload(payload, "main", "abc")
    assert st.counts.success == 2 and st.overall() == "success"


def test_github_summary_one_fail_beats_success():
    payload = {"workflow_runs": [_run("ci", "completed", "success", 2, "abc"),
                                 _run("lint", "completed", "failure", 3, "abc")]}
    st = github.parse_runs_payload(payload, "main", "abc")
    assert st.overall() == "failure"


def test_github_pending_beats_success():
    payload = {"workflow_runs": [_run("ci", "in_progress", None, 2, "abc"),
                                 _run("lint", "completed", "success", 3, "abc")]}
    st = github.parse_runs_payload(payload, "main", "abc")
    assert st.overall() == "pending"


def test_github_dedupe_by_name_keeps_max_id():
    payload = {"workflow_runs": [_run("ci", "completed", "failure", 5, "abc"),
                                 _run("ci", "completed", "success", 9, "abc")]}
    st = github.parse_runs_payload(payload, "main", "abc")
    assert st.overall() == "success"  # newer run wins


def test_github_ignores_older_sha():
    payload = {"workflow_runs": [_run("ci", "completed", "failure", 5, "old"),
                                 _run("ci", "completed", "success", 9, "abc")]}
    st = github.parse_runs_payload(payload, "main", "abc")
    assert st.overall() == "success"
    assert st.counts.failure == 0


def test_github_empty():
    st = github.parse_runs_payload({"workflow_runs": []}, "main", "abc")
    assert st.overall() is None


def test_github_http_error_classification():
    assert "token rejected" in github.classify_http_error(401)
    assert "SSO" in github.classify_http_error(403, "SAML enforcement")
    assert "rate limit" in github.classify_http_error(403, "API rate limit exceeded")
    assert "private" in github.classify_http_error(404)
    assert "500" in github.classify_http_error(500)


def test_github_per_commit_rollups():
    payload = {"workflow_runs": [
        _run("ci", "completed", "success", 2, "aaa"),
        _run("lint", "completed", "failure", 3, "aaa"),
        _run("ci", "in_progress", None, 4, "bbb")]}
    st = github.parse_runs_payload(payload, "main", "aaa")
    rolls = github.per_commit_rollups(st, ["aaa", "bbb", "ccc"])
    assert rolls["aaa"].states == ["failure", "success"]  # fail sorts first
    assert rolls["bbb"].states == ["pending"]
    assert "ccc" not in rolls


# -- GitLab -----------------------------------------------------------------

def test_gitlab_url_heuristic():
    assert gitlab.parse_remote_url("https://gitlab.com/g/p.git") == ("gitlab.com", "g/p")
    assert gitlab.parse_remote_url("git@gitlab.example.io:team/proj.git") == (
        "gitlab.example.io", "team/proj")
    assert gitlab.parse_remote_url("https://github.com/g/p") is None
    # Registered self-hosted host without 'gitlab' in the name:
    assert gitlab.parse_remote_url("https://code.corp.dev/g/p",
                                   ["code.corp.dev"]) == ("code.corp.dev", "g/p")
    assert gitlab.parse_remote_url("https://code.corp.dev/g/p") is None


def test_gitlab_status_mapping():
    assert gitlab.map_pipeline_state("success") is CiState.SUCCESS
    assert gitlab.map_pipeline_state("failed") is CiState.FAILURE
    assert gitlab.map_pipeline_state("running") is CiState.PENDING
    assert gitlab.map_pipeline_state("created") is CiState.PENDING
    assert gitlab.map_pipeline_state("canceled") is CiState.UNKNOWN
    assert gitlab.map_pipeline_state("garbage") is CiState.UNKNOWN


def _pipe(pid, status, sha):
    return {"id": pid, "status": status, "sha": sha, "web_url": ""}


def test_gitlab_head_summary_latest_wins():
    payload = [_pipe(9, "success", "abc"), _pipe(5, "failed", "abc"),
               _pipe(7, "failed", "old")]
    st = gitlab.parse_pipelines_payload(payload, "main", "abc")
    assert st.overall() == "success"


def test_gitlab_per_commit_rollups():
    payload = [_pipe(9, "success", "aaa"), _pipe(5, "failed", "aaa"),
               _pipe(7, "running", "bbb"), _pipe(2, "canceled", "ccc")]
    st = gitlab.parse_pipelines_payload(payload, "main", "aaa")
    rolls = gitlab.per_commit_rollups(st, ["aaa", "bbb", "ccc"])
    assert rolls["aaa"].states == ["success"]
    assert rolls["bbb"].states == ["pending"]
    assert "ccc" not in rolls  # canceled → unknown → dropped


# -- CI core ----------------------------------------------------------------

def test_ci_counts_precedence():
    assert CiCounts(failure=1, pending=2, success=3).overall_state() == "failure"
    assert CiCounts(pending=2, success=3).overall_state() == "pending"
    assert CiCounts(success=3).overall_state() == "success"
    assert CiCounts().overall_state() is None


def test_ci_cross_provider_merge():
    a = CiStatus(provider=CiProvider.GITHUB, counts=CiCounts(success=2))
    b = CiStatus(provider=CiProvider.GITLAB, counts=CiCounts(pending=1))
    assert ci.merge_statuses([a, b]).overall_state() == "pending"
    assert ci.overall_of_results([a]) == "success"


# -- AI ---------------------------------------------------------------------

def test_ai_split_subject_body():
    s, b = ai.split_subject_body("Fix the frobnicator\n\nIt was broken.\nNow fixed.")
    assert s == "Fix the frobnicator"
    assert b == "It was broken.\nNow fixed."
    s, b = ai.split_subject_body("Just a subject")
    assert s == "Just a subject" and b == ""
    s, b = ai.split_subject_body("")
    assert s == "" and b == ""


def test_ai_subject_clamp():
    long = "Implement the " + "very " * 20 + "long subject line"
    s, b = ai.split_subject_body(long)
    assert len(s) <= ai.SUBJECT_CLAMP + 1  # +ellipsis
    assert b  # overflow moved into the body


def test_ai_refuses_empty_diff(temp_repo):
    from whisper_git_tpu.gitcore import GitRepo
    assert ai.spawn_generate_async(GitRepo.open(temp_repo)) is None


# -- config / recents --------------------------------------------------------

def test_recents_normalization(tmp_path):
    a = tmp_path / "repo-a"
    b = tmp_path / "repo-b"
    a.mkdir()
    b.mkdir()
    entries = [
        {"path": str(a), "name": "a"},
        {"path": str(a), "name": "dup"},          # dedupe
        {"path": str(tmp_path / "gone"), "name": "x"},  # nonexistent drop
        {"path": str(b)},                          # name derived
    ]
    out = config_mod.normalize_recents(entries)
    assert [e["path"] for e in out] == [str(a), str(b)]
    assert out[1]["name"] == "repo-b"


def test_recents_cap(tmp_path):
    dirs = []
    for i in range(15):
        d = tmp_path / f"r{i}"
        d.mkdir()
        dirs.append({"path": str(d)})
    assert len(config_mod.normalize_recents(dirs)) == config_mod.MAX_RECENT_REPOS


def test_recents_canonicalize_worktree(temp_repo, git, tmp_path):
    wt = tmp_path / "wt-canon"
    git(temp_repo, "worktree", "add", "-b", "canon", str(wt))
    canon = config_mod.canonical_repo_path(str(wt))
    assert os.path.realpath(canon) == os.path.realpath(temp_repo)


def test_config_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    cfg = config_mod.Config()
    cfg.show_avatars = False
    cfg.sidebar_width = 250.0
    cfg.save()
    loaded = config_mod.Config.load()
    assert not loaded.show_avatars
    assert loaded.sidebar_width == 250.0


# -- token store -------------------------------------------------------------

def test_token_store_file_fallback(tmp_path, monkeypatch):
    from whisper_git_tpu.services import token_store
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    monkeypatch.setattr(token_store, "_secret_tool", lambda: None)
    token_store.clear_cache()
    assert token_store.get_token("github", "github.com") is None
    assert token_store.set_token("github", "github.com", "ghp_secret")
    assert token_store.get_token("github", "github.com") == "ghp_secret"
    # File must be 0600.
    mode = os.stat(token_store._file_path()).st_mode & 0o777
    assert mode == 0o600
    token_store.delete_token("github", "github.com")
    token_store.clear_cache()
    assert token_store.get_token("github", "github.com") is None


# -- crash log ---------------------------------------------------------------

def test_crash_log_lifecycle(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    crash_log.init()
    crash_log.breadcrumb("doing something")
    crash_log.breadcrumb("doing something else")
    assert len(crash_log.breadcrumbs()) >= 2
    try:
        raise RuntimeError("boom")
    except RuntimeError:
        import sys
        path = crash_log.write_crash_report(*sys.exc_info())
    assert path and os.path.exists(path)
    content = open(path).read()
    assert "boom" in content and "doing something" in content
    # Crash-since-exit detection.
    assert crash_log.has_crash_since_last_exit() == path
    time.sleep(0.01)
    crash_log.mark_clean_exit()
    assert crash_log.has_crash_since_last_exit() is None


def test_crash_log_ring_cap(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    crash_log.init()
    for i in range(100):
        crash_log.breadcrumb(f"bc {i}")
    crumbs = crash_log.breadcrumbs()
    assert len(crumbs) == crash_log.RING_SIZE
    assert "bc 99" in crumbs[-1]


# -- avatars -----------------------------------------------------------------

def test_gravatar_url():
    from whisper_git_tpu.services.avatar import gravatar_url
    url = gravatar_url("Test@Example.com ")
    # md5 of "test@example.com"
    assert "55502f40dc8b7c769880b10874abc9d0" in url
    assert "d=404" in url


def test_avatar_cache_no_retry(monkeypatch):
    from whisper_git_tpu.services import avatar
    calls = []

    def fake_download(email, timeout=10.0):
        calls.append(email)
        return None  # network fail

    monkeypatch.setattr(avatar, "download_avatar", fake_download)
    cache = avatar.AvatarCache()
    assert cache.get("x@y.z") is None
    deadline = time.monotonic() + 2
    while time.monotonic() < deadline and len(calls) == 0:
        time.sleep(0.01)
    assert cache.get("x@y.z") is None  # failed → no retry
    time.sleep(0.1)
    assert len(calls) == 1


def test_avatar_prefetch_shared_deadline(monkeypatch):
    """prefetch_sync fans out over a pool under ONE wall deadline: 20
    hung downloads must cost ~timeout total, not 20 × timeout."""
    from whisper_git_tpu.services import avatar

    import threading

    started = []
    release = threading.Event()

    def hung_download(email, timeout=10.0):
        started.append(email)
        release.wait(4.0)  # hangs past the deadline, but bounded so the
        return None        # pool's atexit join can't stall pytest exit

    monkeypatch.setattr(avatar, "download_avatar", hung_download)
    cache = avatar.AvatarCache()
    emails = [f"u{i}@example.com" for i in range(20)]
    t0 = time.monotonic()
    cache.prefetch_sync(emails, timeout=0.5)
    elapsed = time.monotonic() - t0
    release.set()  # unblock straggler threads immediately
    assert elapsed < 4.0, f"prefetch blocked {elapsed:.1f}s (serial?)"
    # Everything in flight at the deadline is marked failed-for-session.
    for e in started:
        assert cache.get(e) is None


def test_avatar_prefetch_parallel_success(monkeypatch):
    from whisper_git_tpu.services import avatar
    import numpy as np

    tile = np.zeros((64, 64, 4), np.uint8)

    def ok_download(email, timeout=10.0):
        time.sleep(0.05)
        return tile

    monkeypatch.setattr(avatar, "download_avatar", ok_download)
    cache = avatar.AvatarCache()
    emails = [f"p{i}@example.com" for i in range(8)]
    t0 = time.monotonic()
    cache.prefetch_sync(emails, timeout=5.0)
    assert time.monotonic() - t0 < 2.0
    for e in emails:
        assert cache.get(e) is not None
