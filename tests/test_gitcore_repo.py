"""Integration tests for the git backend against real temp repos
(mirrors the reference's test tier — SURVEY §4.2: no mock git layer)."""

import os
import time

from whisper_git_tpu.gitcore import (
    CommitInfo,
    FileStatus,
    GitRepo,
    format_relative_time,
    insert_synthetics_sorted,
    ref_fingerprint,
)
from whisper_git_tpu.gitcore import refs as grefs
from whisper_git_tpu.gitcore import status as gstatus
from whisper_git_tpu.gitcore.diff import (
    commit_diff,
    intra_line_highlight,
    parse_unified_diff,
    working_file_diff,
)
from whisper_git_tpu.gitcore.hunk import build_hunk_patch, stage_hunk, unstage_hunk


def test_open_and_identity(temp_repo):
    repo = GitRepo.open(temp_repo)
    assert repo.workdir == os.path.realpath(temp_repo) or repo.workdir == temp_repo
    assert not repo.is_effectively_bare()
    assert repo.repo_name() == "repo"
    assert repo.current_branch() == "main"
    assert repo.head_oid() is not None


def test_open_from_subdir(temp_repo, git):
    sub = os.path.join(temp_repo, "a", "b")
    os.makedirs(sub)
    repo = GitRepo.open(sub)
    assert repo.repo_name() == "repo"


def test_commit_graph(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    for i in range(3):
        with open(os.path.join(temp_repo, f"f{i}.txt"), "w") as f:
            f.write(f"{i}\n")
        git(temp_repo, "add", ".")
        git(temp_repo, "commit", "-m", f"commit {i}")
    commits = repo.commit_graph()
    assert len(commits) == 4
    assert commits[0].summary == "commit 2"
    assert commits[-1].summary == "initial commit"
    assert commits[0].parents == [commits[1].oid]
    assert commits[-1].parents == []


def test_commit_graph_includes_all_branches(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    git(temp_repo, "checkout", "-b", "feature")
    with open(os.path.join(temp_repo, "feat.txt"), "w") as f:
        f.write("x\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "feature work")
    git(temp_repo, "checkout", "main")
    commits = repo.commit_graph()
    assert any(c.summary == "feature work" for c in commits)


def test_commit_graph_cap(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    for i in range(5):
        git(temp_repo, "commit", "--allow-empty", "-m", f"c{i}")
    assert len(repo.commit_graph(max_commits=3)) == 3


def test_empty_repo(tmp_path, git):
    d = tmp_path / "empty"
    d.mkdir()
    git(d, "init", "-b", "main")
    repo = GitRepo.open(str(d))
    assert repo.commit_graph() == []
    assert repo.head_oid() is None
    assert repo.unborn_branch() == "main"


def test_branch_tips_and_ahead_behind(temp_repo, git, tmp_path):
    # Clone to get a remote-tracking setup, then commit locally → ahead 1.
    clone = tmp_path / "clone"
    git(tmp_path, "clone", temp_repo, str(clone))
    git(clone, "config", "user.email", "t@e.com")
    git(clone, "config", "user.name", "T")
    git(clone, "commit", "--allow-empty", "-m", "local work")
    repo = GitRepo.open(str(clone))
    tips = repo.branch_tips()
    local = [t for t in tips if not t.is_remote]
    remote = [t for t in tips if t.is_remote]
    assert len(local) == 1 and local[0].name == "main" and local[0].is_head
    assert local[0].ahead == 1 and local[0].behind == 0
    assert local[0].upstream == "origin/main"
    assert any(t.name == "origin/main" for t in remote)


def test_tags(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    git(temp_repo, "tag", "v1.0")
    git(temp_repo, "tag", "-a", "v2.0", "-m", "release two")
    tags = {t.name: t for t in repo.tags()}
    assert set(tags) == {"v1.0", "v2.0"}
    # Annotated tag must be peeled to the commit.
    assert tags["v2.0"].oid == repo.head_oid()
    assert tags["v2.0"].message == "release two"


def test_worktrees(temp_repo, git, tmp_path):
    repo = GitRepo.open(temp_repo)
    wt = tmp_path / "wt1"
    git(temp_repo, "worktree", "add", "-b", "wt-branch", str(wt))
    wts = repo.worktrees()
    assert len(wts) == 2
    assert wts[0].is_main
    assert wts[1].branch == "wt-branch"
    assert wts[1].name == "wt1"


def test_stashes(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "README.md"), "a") as f:
        f.write("change\n")
    git(temp_repo, "stash", "push", "-m", "wip thing")
    stashes = repo.stashes()
    assert len(stashes) == 1
    assert stashes[0].index == 0
    assert "wip thing" in stashes[0].summary
    assert stashes[0].ref_name == "stash@{0}"


def test_status_buckets(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "README.md"), "a") as f:
        f.write("more\n")
    with open(os.path.join(temp_repo, "staged.txt"), "w") as f:
        f.write("staged\n")
    git(temp_repo, "add", "staged.txt")
    with open(os.path.join(temp_repo, "untracked.txt"), "w") as f:
        f.write("u\n")
    st = gstatus.status(repo)
    assert [e.path for e in st.staged] == ["staged.txt"]
    assert [e.path for e in st.unstaged] == ["README.md"]
    assert [e.path for e in st.untracked] == ["untracked.txt"]
    assert st.staged[0].status == FileStatus.ADDED
    assert st.unstaged[0].status == FileStatus.MODIFIED


def test_stage_unstage_cycle(temp_repo):
    repo = GitRepo.open(temp_repo)
    path = os.path.join(temp_repo, "new.txt")
    with open(path, "w") as f:
        f.write("n\n")
    gstatus.stage_file(repo, "new.txt")
    assert [e.path for e in gstatus.status(repo).staged] == ["new.txt"]
    gstatus.unstage_file(repo, "new.txt")
    st = gstatus.status(repo)
    assert st.staged == []
    assert [e.path for e in st.untracked] == ["new.txt"]


def test_stage_deletion(temp_repo):
    repo = GitRepo.open(temp_repo)
    os.unlink(os.path.join(temp_repo, "README.md"))
    gstatus.stage_file(repo, "README.md")
    st = gstatus.status(repo)
    assert st.staged[0].status == FileStatus.DELETED


def test_commit_and_amend(temp_repo):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "x.txt"), "w") as f:
        f.write("x\n")
    gstatus.stage_file(repo, "x.txt")
    oid = repo.commit("add x")
    assert repo.commit_graph()[0].summary == "add x"
    grefs.amend_commit(repo, "add x (amended)")
    commits = repo.commit_graph()
    assert commits[0].summary == "add x (amended)"
    assert commits[0].oid != oid
    assert repo.commit_count() == 2


def test_checkout_and_branch_ops(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    grefs.create_branch_at(repo, "dev", repo.head_oid())
    grefs.checkout_branch(repo, "dev")
    assert repo.current_branch() == "dev"
    grefs.checkout_detached(repo, repo.head_oid())
    assert repo.current_branch() is None
    grefs.checkout_branch(repo, "main")
    grefs.rename_branch(repo, "dev", "dev2")
    names = {t.name for t in repo.branch_tips()}
    assert "dev2" in names and "dev" not in names
    grefs.delete_branch(repo, "dev2", force=True)
    assert "dev2" not in {t.name for t in repo.branch_tips()}


def test_reset_modes(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    first = repo.head_oid()
    with open(os.path.join(temp_repo, "y.txt"), "w") as f:
        f.write("y\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "second")
    grefs.reset(repo, first, "soft")
    st = gstatus.status(repo)
    assert [e.path for e in st.staged] == ["y.txt"]
    grefs.reset(repo, first, "hard")
    assert gstatus.status(repo).is_clean()


def test_discard_file(temp_repo):
    repo = GitRepo.open(temp_repo)
    p = os.path.join(temp_repo, "README.md")
    with open(p, "a") as f:
        f.write("junk\n")
    grefs.discard_file(repo, "README.md")
    assert open(p).read() == "hello\n"
    up = os.path.join(temp_repo, "untracked.bin")
    with open(up, "w") as f:
        f.write("z")
    grefs.discard_file(repo, "untracked.bin")
    assert not os.path.exists(up)


def test_repo_state_merge(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    assert repo.repo_state() is None
    git(temp_repo, "checkout", "-b", "side")
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("side change\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "side")
    git(temp_repo, "checkout", "main")
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("main change\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "main change")
    import subprocess
    subprocess.run(["git", "-C", temp_repo, "merge", "side"], capture_output=True)
    assert repo.repo_state() == "Merging"


def test_diff_stats(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("line1\nline2\nline3\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "rewrite")
    oids = [c.oid for c in repo.commit_graph()]
    stats = repo.diff_stats_for_commits(oids)
    assert stats[oids[0]] == (3, 1)  # rewrite: -hello +3 lines
    assert stats[oids[1]] == (1, 0)  # initial commit adds 1 line


def test_working_tree_diff_stats(temp_repo):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "README.md"), "a") as f:
        f.write("a\nb\n")
    adds, dels = repo.working_tree_diff_stats()
    assert adds == 2 and dels == 0


def test_orphan_recovery(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    git(temp_repo, "commit", "--allow-empty", "-m", "doomed")
    doomed = repo.head_oid()
    git(temp_repo, "reset", "--hard", "HEAD~1")
    commits = repo.commit_graph_with_orphans()
    orphans = [c for c in commits if c.is_orphan]
    assert any(c.oid == doomed for c in orphans)
    # The plain walk must not contain it.
    assert all(c.oid != doomed for c in repo.commit_graph())


def test_ref_fingerprint_changes_on_commit(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    fp1 = ref_fingerprint(repo.git_dir, repo.common_dir)
    fp2 = ref_fingerprint(repo.git_dir, repo.common_dir)
    assert fp1 == fp2
    git(temp_repo, "commit", "--allow-empty", "-m", "bump")
    assert ref_fingerprint(repo.git_dir, repo.common_dir) != fp1


def test_full_commit_info(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "a.txt"), "w") as f:
        f.write("1\n2\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "subject line\n\nbody text")
    info = grefs.full_commit_info(repo, repo.head_oid())
    assert info.message.startswith("subject line")
    assert "body text" in info.message
    assert info.author_name == "Test User"
    assert len(info.parents) == 1
    assert [f.path for f in info.files] == ["a.txt"]
    assert info.files[0].additions == 2
    assert info.files[0].status == FileStatus.ADDED


def test_submodules(temp_repo, git, tmp_path):
    child = tmp_path / "child"
    child.mkdir()
    git(child, "init", "-b", "main")
    git(child, "config", "user.email", "t@e.com")
    git(child, "config", "user.name", "T")
    (child / "c.txt").write_text("c\n")
    git(child, "add", ".")
    git(child, "commit", "-m", "child initial")
    git(temp_repo, "-c", "protocol.file.allow=always",
        "submodule", "add", str(child), "sub")
    git(temp_repo, "commit", "-m", "add submodule")
    repo = GitRepo.open(temp_repo)
    subs = repo.submodules()
    assert len(subs) == 1
    assert subs[0].path == "sub"
    assert subs[0].initialized
    assert subs[0].head_oid == subs[0].workdir_oid
    pinned = grefs.submodules_at_commit(repo, repo.head_oid())
    assert len(pinned) == 1 and pinned[0].head_oid == subs[0].head_oid
    assert grefs.local_branches_with_submodule_pin(repo, "sub", subs[0].head_oid) == ["main"]


def test_remote_crud(temp_repo):
    repo = GitRepo.open(temp_repo)
    grefs.add_remote(repo, "origin", "https://example.com/r.git")
    assert repo.remotes() == ["origin"]
    assert repo.remote_url("origin") == "https://example.com/r.git"
    grefs.set_remote_url(repo, "origin", "https://example.com/r2.git")
    assert repo.remote_url("origin") == "https://example.com/r2.git"
    grefs.rename_remote(repo, "origin", "upstream")
    assert repo.remotes() == ["upstream"]
    grefs.remove_remote(repo, "upstream")
    assert repo.remotes() == []


def test_missing_fetch_refspec(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    grefs.add_remote(repo, "origin", "https://example.com/r.git")
    assert not grefs.remote_missing_fetch_refspec(repo, "origin")
    git(temp_repo, "config", "--unset-all", "remote.origin.fetch")
    assert grefs.remote_missing_fetch_refspec(repo, "origin")
    grefs.add_default_fetch_refspec(repo, "origin")
    assert not grefs.remote_missing_fetch_refspec(repo, "origin")


# -- pure-logic tests (reference tier §4.1) ---------------------------------

def test_synthetic_rows_sort():
    commits = [
        CommitInfo("a" * 40, "a" * 7, "new", "x", "x@e", 1000),
        CommitInfo("b" * 40, "b" * 7, "old", "x", "x@e", 500),
    ]
    syn = CommitInfo.synthetic_for_worktree("wt1", 750)
    merged = insert_synthetics_sorted(commits, [syn])
    assert [c.summary for c in merged] == ["new", "Uncommitted changes (wt1)", "old"]
    top = CommitInfo.synthetic_for_working_dir(2000)
    merged = insert_synthetics_sorted(commits, [top])
    assert merged[0].is_synthetic and merged[0].oid.startswith("fffd")


def test_relative_time():
    now = int(time.time())
    assert format_relative_time(now, now) == "just now"
    assert format_relative_time(now - 120, now) == "2m ago"
    assert format_relative_time(now - 7200, now) == "2h ago"
    assert format_relative_time(now - 3 * 86400, now) == "3d ago"
    assert format_relative_time(now - 40 * 86400, now) == "1mo ago"
    assert format_relative_time(now - 800 * 86400, now) == "2y ago"


def test_intra_line_highlight():
    (oa, ob), (na, nb) = intra_line_highlight("let x = 5;", "let x = 42;")
    assert "let x = 5;"[oa:ob] == "5"
    assert "let x = 42;"[na:nb] == "42"
    # Identical lines → empty ranges.
    (oa, ob), (na, nb) = intra_line_highlight("same", "same")
    assert oa == ob and na == nb
    # UTF-8 boundary snapping: no mid-codepoint splits.
    old, new = "héllo", "héllp"
    (oa, ob), (na, nb) = intra_line_highlight(old, new)
    old_b, new_b = old.encode(), new.encode()
    for idx in (oa, ob):
        assert idx == len(old_b) or (old_b[idx] & 0xC0) != 0x80
    for idx in (na, nb):
        assert idx == len(new_b) or (new_b[idx] & 0xC0) != 0x80


def test_parse_unified_diff_roundtrip(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("hello world\nsecond\n")
    files = working_file_diff(repo, "README.md", staged=False)
    assert len(files) == 1
    f0 = files[0]
    assert f0.path == "README.md"
    assert f0.additions == 2 and f0.deletions == 1
    origins = [l.origin for h in f0.hunks for l in h.lines]
    assert "-" in origins and "+" in origins
    # Word-level highlight: "hello" prefix is common with "hello world".
    plus = [l for h in f0.hunks for l in h.lines if l.origin == "+" and "hello" in l.content]
    assert plus and plus[0].highlights


def test_commit_diff_and_untracked_diff(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    files = commit_diff(repo, repo.head_oid())  # root commit
    assert [f.path for f in files] == ["README.md"]
    assert files[0].status == FileStatus.ADDED
    with open(os.path.join(temp_repo, "brand_new.txt"), "w") as f:
        f.write("a\nb\n")
    nf = working_file_diff(repo, "brand_new.txt", staged=False)
    assert len(nf) == 1 and nf[0].status == FileStatus.ADDED and nf[0].additions == 2


def test_hunk_stage_unstage(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("changed\n")
    files = working_file_diff(repo, "README.md", staged=False)
    hunk = files[0].hunks[0]
    res = stage_hunk(repo, "README.md", hunk)
    assert res.success, res.stderr
    st = gstatus.status(repo)
    assert [e.path for e in st.staged] == ["README.md"]
    assert st.unstaged == []
    staged_files = working_file_diff(repo, "README.md", staged=True)
    res = unstage_hunk(repo, "README.md", staged_files[0].hunks[0])
    assert res.success, res.stderr
    assert gstatus.status(repo).staged == []


def test_discard_hunk(temp_repo):
    from whisper_git_tpu.gitcore.hunk import discard_hunk
    repo = GitRepo.open(temp_repo)
    p = os.path.join(temp_repo, "README.md")
    with open(p, "w") as f:
        f.write("mutated\n")
    files = working_file_diff(repo, "README.md", staged=False)
    res = discard_hunk(repo, "README.md", files[0].hunks[0])
    assert res.success, res.stderr
    assert open(p).read() == "hello\n"


def test_commit_diff_rename_binary_unicode(temp_repo, git):
    """End-to-end parser regression: a commit mixing a rename of a
    unicode/spaced path, a binary change, and a mode-only change must
    surface rename old→new, the binary flag, and keep parsing (the
    compare view feeds arbitrary ranges through this parser)."""
    import os
    import subprocess as sp

    from whisper_git_tpu.gitcore.diff import commit_diff
    from whisper_git_tpu.gitcore.types import FileStatus

    d = temp_repo
    with open(os.path.join(d, "naïve café.txt"), "w") as f:
        f.write("hello\nworld\n")
    with open(os.path.join(d, "bin.dat"), "wb") as f:
        f.write(bytes(range(256)))
    with open(os.path.join(d, "script.sh"), "w") as f:
        f.write("#!/bin/sh\necho hi\n")
    git(d, "add", "-A")
    git(d, "commit", "-m", "base")
    os.rename(os.path.join(d, "naïve café.txt"),
              os.path.join(d, "renamed ünïcode.txt"))
    with open(os.path.join(d, "renamed ünïcode.txt"), "a") as f:
        f.write("extra\n")
    with open(os.path.join(d, "bin.dat"), "wb") as f:
        f.write(bytes(range(255, -1, -1)))
    os.chmod(os.path.join(d, "script.sh"), 0o755)
    git(d, "add", "-A")
    git(d, "commit", "-m", "changes")

    repo = GitRepo.open(d)
    head = sp.run(["git", "-C", d, "rev-parse", "HEAD"],
                  capture_output=True, text=True).stdout.strip()
    by_path = {f.path: f for f in commit_diff(repo, head)}
    assert by_path["bin.dat"].is_binary
    ren = by_path["renamed ünïcode.txt"]
    assert ren.status == FileStatus.RENAMED
    assert ren.old_path == "naïve café.txt"
    assert ren.additions == 1
    assert "script.sh" in by_path  # mode-only change still listed


def test_repo_name_bare_with_worktrees_layout(tmp_path, git):
    """The reference README's featured layout (proj/.bare + proj/.git
    pointer + sibling worktrees, README:365-377) must surface the
    PROJECT name, not '.bare'."""
    import subprocess as sp

    proj = tmp_path / "myproject"
    proj.mkdir()
    sp.run(["git", "init", "-q", "--bare", str(proj / ".bare"),
            "-b", "main"], check=True, capture_output=True)
    (proj / ".git").write_text("gitdir: ./.bare\n")
    repo = GitRepo.open(str(proj))
    assert repo.repo_name() == "myproject"


def test_hunk_ops_on_file_without_trailing_newline(temp_repo, git):
    """Regression: the unified-diff parser dropped the '\\ No newline at
    end of file' marker, so rebuilt hunk patches were invalid and stage/
    unstage/discard ALL failed on files without a trailing newline."""
    from whisper_git_tpu.gitcore.diff import working_file_diff
    from whisper_git_tpu.gitcore.hunk import (
        discard_hunk, stage_hunk, unstage_hunk)
    from whisper_git_tpu.gitcore.status import status as _status

    d = temp_repo
    with open(os.path.join(d, "no_nl.txt"), "w") as f:
        f.write("line1\nline2")  # no trailing newline
    git(d, "add", "-A")
    git(d, "commit", "-m", "base")
    with open(os.path.join(d, "no_nl.txt"), "w") as f:
        f.write("line1\nline2 changed")

    repo = GitRepo.open(d)
    files = working_file_diff(repo, "no_nl.txt", staged=False)
    assert files[0].hunks[0].lines[-1].no_newline
    assert stage_hunk(repo, "no_nl.txt", files[0].hunks[0]).success
    assert [e.path for e in _status(repo).staged] == ["no_nl.txt"]

    staged = working_file_diff(repo, "no_nl.txt", staged=True)
    assert unstage_hunk(repo, "no_nl.txt", staged[0].hunks[0]).success
    assert not _status(repo).staged

    files = working_file_diff(repo, "no_nl.txt", staged=False)
    assert discard_hunk(repo, "no_nl.txt", files[0].hunks[0]).success
    with open(os.path.join(d, "no_nl.txt")) as f:
        assert f.read() == "line1\nline2"


def test_rename_numstat_counts(temp_repo, git):
    """A renamed-and-edited file must carry its real ± counts — numstat
    prints 'old => new' (or brace-compressed) for renames, which must
    key by the NEW path to join with name-status."""
    import os

    from whisper_git_tpu.gitcore.diff import (
        _parse_numstat_z,
        parse_name_status,
    )
    from whisper_git_tpu.gitcore.repo import GitRepo
    from whisper_git_tpu.gitcore.types import FileStatus

    repo = GitRepo.open(temp_repo)
    p = os.path.join(temp_repo, "original.txt")
    with open(p, "w") as f:
        f.write("".join(f"line {i}\n" for i in range(50)))
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "add original")
    git(temp_repo, "mv", "original.txt", "renamed.txt")
    with open(os.path.join(temp_repo, "renamed.txt"), "a") as f:
        f.write("new tail line\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "rename and edit")
    files = parse_name_status(repo, repo.head_oid())
    renamed = next(f for f in files if f.path == "renamed.txt")
    assert renamed.status is FileStatus.RENAMED
    assert renamed.old_path == "original.txt"
    assert (renamed.additions, renamed.deletions) == (1, 0)

    # -z wire format: renames carry an EMPTY path field then old\0new;
    # plain entries keep their path inline — including ones literally
    # containing " => " (the arrow spelling could not disambiguate).
    out = "3\t1\tplain.txt\x002\t0\t\x00old.txt\x00new.txt\x00" \
          "1\t0\ta => b.txt\x00"
    counts = _parse_numstat_z(out)
    assert counts == {"plain.txt": (3, 1), "new.txt": (2, 0),
                      "a => b.txt": (1, 0)}


def test_merge_commit_diff_stats(temp_repo, git):
    """Merges must carry real ± counts vs their first parent — without
    --diff-merges=first-parent, git emits NO numstat for merges and
    every merge showed +0 −0 in the graph."""
    import os

    from whisper_git_tpu.gitcore.repo import GitRepo

    git(temp_repo, "checkout", "-qb", "side")
    with open(os.path.join(temp_repo, "side.txt"), "w") as f:
        f.write("a\nb\nc\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-qm", "side work")
    git(temp_repo, "checkout", "-q", "main")
    git(temp_repo, "merge", "-q", "--no-ff", "-m", "merge side", "side")
    repo = GitRepo.open(temp_repo)
    merge_oid = repo.head_oid()
    stats = repo.diff_stats_for_commits([merge_oid])
    assert stats[merge_oid] == (3, 0)


def test_subject_with_field_separator_survives(temp_repo, git):
    """A 0x1f byte in a commit subject is legal; the record parser must
    bound its split or the commit silently vanishes from the graph."""
    from whisper_git_tpu.gitcore.repo import GitRepo

    git(temp_repo, "commit", "--allow-empty", "-m",
        "weird\x1fsubject with separator")
    repo = GitRepo.open(temp_repo)
    commits = repo.commit_graph()
    assert commits[0].summary == "weird\x1fsubject with separator"
    # Full message path too (%B is the last field).
    from whisper_git_tpu.gitcore.refs import full_commit_info
    info = full_commit_info(repo, commits[0].oid)
    assert "weird\x1fsubject" in info.message


def test_submodule_pin_changed_on_merge(temp_repo, git, tmp_path):
    """Pin changes carried by a MERGE commit must register (plain
    diff-tree prints nothing for merges)."""
    import subprocess

    from whisper_git_tpu.gitcore.refs import submodule_pin_changed
    from whisper_git_tpu.gitcore.repo import GitRepo

    sub = str(tmp_path / "subrepo")
    subprocess.run(["git", "init", "-q", "-b", "main", sub], check=True)
    for cmd in (["config", "user.email", "s@s.s"],
                ["config", "user.name", "S"],
                ["commit", "--allow-empty", "-qm", "s1"]):
        subprocess.run(["git", "-C", sub, *cmd], check=True,
                       capture_output=True)
    env_c = ["-c", "protocol.file.allow=always"]
    subprocess.run(["git", *env_c, "-C", temp_repo, "submodule", "add",
                    sub, "thesub"], check=True, capture_output=True)
    git(temp_repo, "commit", "-qm", "add submodule")
    # Advance the sub on a branch, then merge the pin bump into main.
    subprocess.run(["git", "-C", sub, "commit", "--allow-empty", "-qm",
                    "s2"], check=True, capture_output=True)
    git(temp_repo, "checkout", "-qb", "bump")
    subprocess.run(["git", "-C", f"{temp_repo}/thesub", "pull", "-q",
                    "origin" if False else sub, "main"],
                   check=True, capture_output=True)
    git(temp_repo, "add", "thesub")
    git(temp_repo, "commit", "-qm", "bump pin")
    git(temp_repo, "checkout", "-q", "main")
    git(temp_repo, "merge", "-q", "--no-ff", "-m", "merge bump", "bump")
    repo = GitRepo.open(temp_repo)
    assert submodule_pin_changed(repo, repo.head_oid(), "thesub")
    # The root commit path must not crash either.
    root = repo.commit_graph()[-1].oid
    submodule_pin_changed(repo, root, "thesub")  # no exception
