"""Differential tests for the native status scanner (native/statusscan.cc).

The scanner's contract: for every repository state it *answers*, the four
dirty bits must agree exactly with `git status --porcelain=v2
--ignore-submodules=all`; anything it cannot certify must return None
(fallback). Every case here builds a real repo and compares against git
itself — the same no-mock ground-truth strategy the reference uses for its
status machinery (SURVEY §4.2)."""

import os
import subprocess

import pytest

from whisper_git_tpu.gitcore import GitRepo, native
from whisper_git_tpu.gitcore import status as gstatus

needs_native = pytest.mark.skipif(
    not (native.available() and hasattr(native._lib(), "wgit_quick_dirty")),
    reason="libwgitcore.so with wgit_quick_dirty not built")

pytestmark = needs_native


def porcelain_status(repo: GitRepo):
    """Ground truth: the subprocess path, with the native fast path off."""
    os.environ["WGIT_NATIVE_STATUS"] = "0"
    try:
        return gstatus.status(repo, exclude_submodules=True)
    finally:
        del os.environ["WGIT_NATIVE_STATUS"]


def ground_truth_bits(repo: GitRepo) -> int:
    st = porcelain_status(repo)
    bits = 0
    if st.staged:
        bits |= native.DIRTY_STAGED
    if st.unstaged:
        bits |= native.DIRTY_UNSTAGED
    if st.untracked:
        bits |= native.DIRTY_UNTRACKED
    if st.conflicted:
        bits |= native.DIRTY_CONFLICTED
    return bits


def scan(repo_path: str):
    repo = GitRepo.open(repo_path)
    got = native.quick_dirty(repo.workdir, repo.git_dir, repo.common_dir)
    want = ground_truth_bits(repo)
    return got, want


def assert_agrees(repo_path: str):
    got, want = scan(repo_path)
    assert got is not None, "scanner declined a certifiable repo"
    assert got == want, f"native bits {got:04b} != git bits {want:04b}"
    assert_full_agrees(repo_path)


def assert_full_agrees(repo_path: str):
    """Full-status differential: the native record list must reproduce the
    porcelain buckets exactly (paths, letters, rename origins) — or decline
    (None), in which case status() transparently used porcelain anyway."""
    repo = GitRepo.open(repo_path)
    records = native.status_scan(repo.workdir, repo.git_dir, repo.common_dir)
    truth = porcelain_status(repo)
    via_status = gstatus.status(repo, exclude_submodules=True)
    for bucket in ("staged", "unstaged", "untracked", "conflicted"):
        want = sorted((e.path, e.status, e.orig_path or None)
                      for e in getattr(truth, bucket))
        got = sorted((e.path, e.status, e.orig_path or None)
                     for e in getattr(via_status, bucket))
        assert got == want, f"{bucket}: {got} != {want}"
    if records is None:
        return  # declined — fallback covered above
    st = gstatus._native_status(repo, include_untracked=True)
    for bucket in ("staged", "unstaged", "untracked", "conflicted"):
        want = sorted((e.path, e.status, e.orig_path or None)
                      for e in getattr(truth, bucket))
        got = sorted((e.path, e.status, e.orig_path or None)
                     for e in getattr(st, bucket))
        assert got == want, f"native {bucket}: {got} != {want}"


def test_clean_repo(temp_repo, git):
    os.makedirs(os.path.join(temp_repo, "sub/deep"))
    with open(os.path.join(temp_repo, "sub/deep/a.txt"), "w") as f:
        f.write("content\n")
    exe = os.path.join(temp_repo, "run.sh")
    with open(exe, "w") as f:
        f.write("#!/bin/sh\n")
    os.chmod(exe, 0o755)
    os.symlink("README.md", os.path.join(temp_repo, "link"))
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "more files")
    assert_agrees(temp_repo)
    got, _ = scan(temp_repo)
    assert got == 0


def test_touched_but_unchanged_is_clean(temp_repo):
    # Rewriting identical content invalidates the cached stat → the scanner
    # must re-hash and still answer clean.
    p = os.path.join(temp_repo, "README.md")
    content = open(p).read()
    with open(p, "w") as f:
        f.write(content)
    os.utime(p, (1_700_000_000, 1_700_000_000))
    assert_agrees(temp_repo)
    got, _ = scan(temp_repo)
    assert got == 0


def test_modified_same_size_and_resized(temp_repo):
    p = os.path.join(temp_repo, "README.md")
    with open(p, "w") as f:
        f.write("jello\n")  # same byte length as "hello\n"
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNSTAGED
    with open(p, "w") as f:
        f.write("a much longer line of text\n")
    assert_agrees(temp_repo)


def test_deleted_tracked_file(temp_repo):
    os.unlink(os.path.join(temp_repo, "README.md"))
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNSTAGED


def test_staged_variants(temp_repo, git):
    # staged new file
    with open(os.path.join(temp_repo, "new.txt"), "w") as f:
        f.write("new\n")
    git(temp_repo, "add", "new.txt")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_STAGED
    git(temp_repo, "commit", "-m", "add new")

    # staged modification
    with open(os.path.join(temp_repo, "new.txt"), "w") as f:
        f.write("changed\n")
    git(temp_repo, "add", "new.txt")
    assert_agrees(temp_repo)

    # staged deletion
    git(temp_repo, "commit", "-m", "mod")
    git(temp_repo, "rm", "-q", "new.txt")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_STAGED

    # staged mode change
    git(temp_repo, "commit", "-m", "rm")
    os.chmod(os.path.join(temp_repo, "README.md"), 0o755)
    git(temp_repo, "add", "README.md")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_STAGED


def test_staged_rename(temp_repo, git):
    git(temp_repo, "mv", "README.md", "README2.md")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_STAGED
    # exact rename: full status must report R with the origin path
    repo = GitRepo.open(temp_repo)
    records = native.status_scan(repo.workdir, repo.git_dir, repo.common_dir)
    assert records == [(0, "R", "README2.md", "README.md")]
    assert_full_agrees(temp_repo)


def test_similarity_rename_declines(temp_repo, git):
    """A rename with edits is git's similarity call, not ours: the full scan
    must decline and status() must fall back to porcelain (which pairs it)."""
    content = open(os.path.join(temp_repo, "README.md")).read()
    os.unlink(os.path.join(temp_repo, "README.md"))
    with open(os.path.join(temp_repo, "MOVED.md"), "w") as f:
        f.write(content + "one extra line to drop below 100% similarity\n" * 2)
    git(temp_repo, "add", "-A")
    repo = GitRepo.open(temp_repo)
    assert native.status_scan(repo.workdir, repo.git_dir,
                              repo.common_dir) is None
    assert_full_agrees(temp_repo)  # exercises the fallback equality
    # the cheap bitmask stays answerable (staged, whatever the pairing)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) == native.DIRTY_STAGED


def test_exec_bit_flip_unstaged(temp_repo):
    os.chmod(os.path.join(temp_repo, "README.md"), 0o755)
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNSTAGED


def test_symlink_retarget(temp_repo, git):
    os.symlink("README.md", os.path.join(temp_repo, "link"))
    git(temp_repo, "add", "link")
    git(temp_repo, "commit", "-m", "link")
    os.unlink(os.path.join(temp_repo, "link"))
    os.symlink("other", os.path.join(temp_repo, "link"))
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNSTAGED


def test_typechange(temp_repo):
    p = os.path.join(temp_repo, "README.md")
    os.unlink(p)
    os.symlink("elsewhere", p)
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNSTAGED


def test_untracked_and_gitignore(temp_repo, git):
    with open(os.path.join(temp_repo, ".gitignore"), "w") as f:
        f.write("*.log\n/build/\nsecret*\n!secret.keep\n")
    git(temp_repo, "add", ".gitignore")
    git(temp_repo, "commit", "-m", "ignores")

    # all-ignored additions → clean
    os.makedirs(os.path.join(temp_repo, "build/objs"))
    with open(os.path.join(temp_repo, "build/objs/x.o"), "w") as f:
        f.write("o")
    with open(os.path.join(temp_repo, "a.log"), "w") as f:
        f.write("log")
    with open(os.path.join(temp_repo, "secret.txt"), "w") as f:
        f.write("s")
    got, want = scan(temp_repo)
    assert got == want == 0

    # negated pattern re-includes
    with open(os.path.join(temp_repo, "secret.keep"), "w") as f:
        f.write("k")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNTRACKED


def test_nested_gitignore_scopes(temp_repo, git):
    os.makedirs(os.path.join(temp_repo, "sub"))
    with open(os.path.join(temp_repo, "sub/.gitignore"), "w") as f:
        f.write("local-only.txt\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "sub ignores")
    # ignored inside sub/ …
    with open(os.path.join(temp_repo, "sub/local-only.txt"), "w") as f:
        f.write("x")
    got, want = scan(temp_repo)
    assert got == want == 0
    # … but not at the root
    with open(os.path.join(temp_repo, "local-only.txt"), "w") as f:
        f.write("x")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNTRACKED


def test_double_star_pattern(temp_repo, git):
    with open(os.path.join(temp_repo, ".gitignore"), "w") as f:
        f.write("docs/**/generated\n")
    git(temp_repo, "add", ".gitignore")
    git(temp_repo, "commit", "-m", "glob")
    os.makedirs(os.path.join(temp_repo, "docs/a/b/generated"))
    with open(os.path.join(temp_repo, "docs/a/b/generated/out.txt"), "w") as f:
        f.write("g")
    got, want = scan(temp_repo)
    assert got == want == 0


def test_conflict_state(temp_repo, git):
    p = os.path.join(temp_repo, "README.md")
    git(temp_repo, "checkout", "-q", "-b", "side")
    with open(p, "w") as f:
        f.write("side\n")
    git(temp_repo, "commit", "-am", "side edit")
    git(temp_repo, "checkout", "-q", "main")
    with open(p, "w") as f:
        f.write("main\n")
    git(temp_repo, "commit", "-am", "main edit")
    subprocess.run(["git", "-C", temp_repo, "merge", "side"],
                   capture_output=True)
    got, want = scan(temp_repo)
    assert got is not None
    assert got & native.DIRTY_CONFLICTED
    assert got == want


def test_packed_objects_and_refs(temp_repo, git):
    # Force everything into packfiles (deltas included) and packed-refs.
    for i in range(30):
        with open(os.path.join(temp_repo, "file.txt"), "w") as f:
            f.write(("line %d\n" % i) * 50)
        git(temp_repo, "add", "file.txt")
        git(temp_repo, "commit", "-m", f"rev {i}")
    git(temp_repo, "gc", "-q", "--aggressive", "--prune=now")
    got, want = scan(temp_repo)
    assert got == want == 0
    # staged compare must read HEAD's tree out of the pack
    with open(os.path.join(temp_repo, "file.txt"), "a") as f:
        f.write("tail\n")
    git(temp_repo, "add", "file.txt")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_STAGED


def test_detached_head(temp_repo, git):
    git(temp_repo, "commit", "--allow-empty", "-m", "two")
    git(temp_repo, "checkout", "-q", "HEAD~1")
    assert_agrees(temp_repo)


def test_unborn_head_with_staged(tmp_path, git):
    repo = tmp_path / "fresh"
    repo.mkdir()
    git(repo, "init", "-b", "main")
    git(repo, "config", "user.email", "t@e.c")
    git(repo, "config", "user.name", "T")
    assert_agrees(str(repo))
    (repo / "f.txt").write_text("x\n")
    git(repo, "add", "f.txt")
    got, want = scan(str(repo))
    assert got == want == native.DIRTY_STAGED


def test_intent_to_add(temp_repo, git):
    with open(os.path.join(temp_repo, "ita.txt"), "w") as f:
        f.write("x\n")
    git(temp_repo, "add", "-N", "ita.txt")
    got, want = scan(temp_repo)
    assert got is not None
    assert got != 0 and want != 0  # both sides agree it's dirty


def test_linked_worktree(temp_repo, git):
    wt = os.path.join(os.path.dirname(temp_repo), "wt")
    git(temp_repo, "worktree", "add", "-q", wt, "-b", "wt-branch")
    assert_agrees(wt)
    with open(os.path.join(wt, "scratch.txt"), "w") as f:
        f.write("x")
    got, want = scan(wt)
    assert got == want == native.DIRTY_UNTRACKED
    # the main worktree must stay unaffected
    got, want = scan(temp_repo)
    assert got == want == 0


def test_submodule_changes_excluded(temp_repo, git, tmp_path):
    inner = tmp_path / "inner"
    inner.mkdir()
    git(inner, "init", "-b", "main")
    git(inner, "config", "user.email", "t@e.c")
    git(inner, "config", "user.name", "T")
    (inner / "lib.txt").write_text("v1\n")
    git(inner, "add", ".")
    git(inner, "commit", "-m", "inner")
    subprocess.run(["git", "-C", temp_repo, "-c", "protocol.file.allow=always",
                    "submodule", "add", str(inner), "vendor/inner"],
                   check=True, capture_output=True)
    git(temp_repo, "commit", "-m", "add submodule")
    assert_agrees(temp_repo)
    # dirty the submodule working copy: parent must stay clean
    with open(os.path.join(temp_repo, "vendor/inner/lib.txt"), "a") as f:
        f.write("v2\n")
    with open(os.path.join(temp_repo, "vendor/inner/junk.txt"), "w") as f:
        f.write("junk")
    got, want = scan(temp_repo)
    assert got == want == 0


def test_fallback_on_autocrlf(temp_repo, git):
    git(temp_repo, "config", "core.autocrlf", "true")
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None


def test_fallback_on_autocrlf_input(temp_repo, git):
    git(temp_repo, "config", "core.autocrlf", "input")
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None


def test_git_boolean_grammar(temp_repo, git):
    """git accepts yes/no/on/off/1/0 for booleans; the scanner must too."""
    # core.ignorecase = yes → dangerous → decline
    git(temp_repo, "config", "core.ignorecase", "yes")
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None
    git(temp_repo, "config", "--unset", "core.ignorecase")
    # core.filemode = off → exec-bit differences are not modifications
    git(temp_repo, "config", "core.filemode", "off")
    os.chmod(os.path.join(temp_repo, "README.md"), 0o755)
    assert_agrees(temp_repo)
    got, _ = scan(temp_repo)
    assert got == 0


def test_fallback_on_included_config(temp_repo, git, tmp_path):
    """[include]d config files carry the same certainty preconditions."""
    inc = tmp_path / "inc.cfg"
    inc.write_text("[core]\n\tautocrlf = true\n")
    with open(os.path.join(temp_repo, ".git", "config"), "a") as f:
        f.write(f"[include]\n\tpath = {inc}\n")
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None


def test_fallback_on_conditional_include_filemode(temp_repo, git, tmp_path):
    """[includeIf] conditions can't be evaluated natively: behaviour keys
    reached through one force a refusal instead of a guess."""
    inc = tmp_path / "cond.cfg"
    inc.write_text("[core]\n\tfilemode = false\n")
    with open(os.path.join(temp_repo, ".git", "config"), "a") as f:
        f.write(f'[includeIf "gitdir:/nowhere/"]\n\tpath = {inc}\n')
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None


def test_fallback_on_global_attributes(temp_repo, git, tmp_path,
                                       monkeypatch):
    """Global gitattributes (XDG default) carrying text/eol rules must make
    the scanner decline — they change blob hashing like local ones."""
    gdir = tmp_path / "xdg" / "git"
    gdir.mkdir(parents=True)
    (gdir / "attributes").write_text("* text=auto\n")
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "xdg"))
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None
    # harmless global attributes keep the fast path
    (gdir / "attributes").write_text("*.lock linguist-generated\n")
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) == 0


def test_fallback_on_working_tree_encoding(temp_repo, git):
    with open(os.path.join(temp_repo, ".gitattributes"), "w") as f:
        f.write("*.txt working-tree-encoding=UTF-16LE\n")
    git(temp_repo, "add", ".gitattributes")
    git(temp_repo, "-c", "core.attributesfile=/dev/null", "commit", "-m",
        "attrs")
    with open(os.path.join(temp_repo, "data.txt"), "wb") as f:
        f.write("hi\n".encode("utf-16-le"))
    git(temp_repo, "add", "data.txt")
    git(temp_repo, "commit", "-m", "data")
    os.utime(os.path.join(temp_repo, "data.txt"),
             (1_700_000_000, 1_700_000_000))
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None


def test_fallback_on_reftable(tmp_path, git):
    """Repos with a ref backend our resolver can't read must refuse, not
    misreport every file as staged."""
    import subprocess
    repo = tmp_path / "rt"
    repo.mkdir()
    r = subprocess.run(["git", "init", "-b", "main",
                        "--ref-format=reftable", str(repo)],
                       capture_output=True)
    if r.returncode != 0:
        # this git predates reftable; simulate the layout markers
        git(repo, "init", "-b", "main") if False else subprocess.run(
            ["git", "init", "-b", "main", str(repo)], check=True,
            capture_output=True)
        subprocess.run(["git", "-C", str(repo), "config",
                        "extensions.refstorage", "reftable"], check=True,
                       capture_output=True)
        os.makedirs(repo / ".git" / "reftable", exist_ok=True)
    repo_o = GitRepo.open(str(repo))
    assert native.quick_dirty(repo_o.workdir, repo_o.git_dir,
                              repo_o.common_dir) is None


def test_fallback_on_filter_attributes(temp_repo, git):
    with open(os.path.join(temp_repo, ".gitattributes"), "w") as f:
        f.write("*.txt filter=lfs\n")
    git(temp_repo, "add", ".gitattributes")
    git(temp_repo, "commit", "-m", "attrs")
    # Force a re-hash under the filtered path → scanner must decline.
    p = os.path.join(temp_repo, "data.txt")
    with open(p, "w") as f:
        f.write("x\n")
    git(temp_repo, "add", "data.txt")
    git(temp_repo, "commit", "-m", "data")
    os.utime(p, (1_700_000_000, 1_700_000_000))
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None


def test_safe_attributes_do_not_fallback(temp_repo, git):
    # linguist/diff attributes don't change blob hashing → still certifiable.
    with open(os.path.join(temp_repo, ".gitattributes"), "w") as f:
        f.write("*.lock linguist-generated\n*.bin diff=hex\n")
    git(temp_repo, "add", ".gitattributes")
    git(temp_repo, "commit", "-m", "attrs")
    os.utime(os.path.join(temp_repo, "README.md"),
             (1_700_000_000, 1_700_000_000))
    assert_agrees(temp_repo)


def test_randomized_states_agree(temp_repo, git):
    """Pseudo-random walk over repo mutations; verdicts must track git."""
    import random
    rng = random.Random(1234)
    ops = 0
    for step in range(40):
        roll = rng.random()
        name = f"f{rng.randrange(6)}.txt"
        p = os.path.join(temp_repo, name)
        if roll < 0.3:
            with open(p, "w") as f:
                f.write(f"content {step} {rng.random()}\n")
        elif roll < 0.5 and os.path.exists(p):
            git(temp_repo, "add", name)
        elif roll < 0.6 and os.path.exists(p):
            os.unlink(p)
        elif roll < 0.75:
            subprocess.run(["git", "-C", temp_repo, "commit", "-q", "-m",
                            f"step {step}"], capture_output=True)
        elif roll < 0.85 and os.path.exists(p):
            os.chmod(p, 0o755 if rng.random() < 0.5 else 0o644)
        else:
            subprocess.run(["git", "-C", temp_repo, "reset", "-q"],
                           capture_output=True)
        got, want = scan(temp_repo)
        assert got is not None
        assert got == want, f"divergence at step {step}: {got:04b} vs {want:04b}"
        assert_full_agrees(temp_repo)
        ops += 1
    assert ops == 40


def test_threaded_walk_agrees(temp_repo, git):
    """Trees past the ~2k-entry threshold run the multithreaded walk; the
    verdict must stay exact for dirt hidden in any corner of the tree."""
    for d in range(30):
        os.makedirs(os.path.join(temp_repo, f"t{d}/inner"), exist_ok=True)
        for i in range(80):
            with open(os.path.join(temp_repo, f"t{d}/inner/f{i}.txt"), "w") as f:
                f.write(f"{d}-{i}\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "2400 files")
    assert_agrees(temp_repo)
    got, _ = scan(temp_repo)
    assert got == 0
    # one modified file deep in the tree
    with open(os.path.join(temp_repo, "t17/inner/f42.txt"), "w") as f:
        f.write("changed\n")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNSTAGED
    git(temp_repo, "checkout", "-q", "--", "t17/inner/f42.txt")
    # one untracked file deep in the tree
    with open(os.path.join(temp_repo, "t23/inner/new.bin"), "w") as f:
        f.write("n")
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNTRACKED
    os.unlink(os.path.join(temp_repo, "t23/inner/new.bin"))
    # one deleted file (settled by the unvisited pass)
    os.unlink(os.path.join(temp_repo, "t5/inner/f3.txt"))
    got, want = scan(temp_repo)
    assert got == want == native.DIRTY_UNSTAGED


def test_quick_dirty_is_fast(temp_repo, git):
    """The reason this exists: a big tree must check in ~single-digit ms
    (subprocess porcelain costs ~10-30 ms even on small repos)."""
    import time
    for d in range(20):
        os.makedirs(os.path.join(temp_repo, f"dir{d}"), exist_ok=True)
        for i in range(50):
            with open(os.path.join(temp_repo, f"dir{d}/f{i}.txt"), "w") as f:
                f.write(f"file {d}/{i}\n")
    git(temp_repo, "add", ".")
    git(temp_repo, "commit", "-m", "1000 files")
    repo = GitRepo.open(temp_repo)
    native.quick_dirty(repo.workdir, repo.git_dir, repo.common_dir)  # warm
    t0 = time.perf_counter()
    for _ in range(20):
        bits = native.quick_dirty(repo.workdir, repo.git_dir, repo.common_dir)
    per_call = (time.perf_counter() - t0) / 20 * 1000
    assert bits == 0
    assert per_call < 25.0  # generous bound for loaded CI machines


# ---------------------------------------------------------------------------
# Randomized differential fuzzing: random TREES × random INDEX states
# (VERDICT r1 #10). The flat-file walk above covers op sequencing; this
# covers structure — nested dirs, unicode/space names, renames, ignores,
# symlinks, directory deletion — against `git status --porcelain` truth.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [7, 99, 1234, 424242])
def test_fuzz_random_trees_and_index_states(tmp_path, git, seed):
    import random
    import shutil

    rng = random.Random(seed)
    repo_dir = str(tmp_path / "fuzz")
    os.makedirs(repo_dir)
    git(repo_dir, "init", "-b", "main")
    git(repo_dir, "config", "user.email", "f@z.z")
    git(repo_dir, "config", "user.name", "Fuzz")

    dirs = ["", "src", "src/deep", "assets img", "üñïçø∂é"]
    names = ["a.txt", "b c.txt", "Δelta.py", ".hidden", "z"]

    def rand_path():
        return os.path.join(rng.choice(dirs), rng.choice(names)).lstrip("/")

    tracked_any = False
    for step in range(50):
        rel = rand_path()
        p = os.path.join(repo_dir, rel)
        roll = rng.random()
        try:
            if roll < 0.28:
                os.makedirs(os.path.dirname(p) or repo_dir, exist_ok=True)
                with open(p, "w") as f:
                    f.write(f"step {step} {rng.random()}\n" * rng.randrange(1, 4))
            elif roll < 0.42:
                git(repo_dir, "add", "-A")
                tracked_any = True
            elif roll < 0.52 and os.path.isfile(p):
                os.unlink(p)
            elif roll < 0.60 and tracked_any:
                subprocess.run(["git", "-C", repo_dir, "commit", "-q", "-m",
                                f"s{step}"], capture_output=True)
            elif roll < 0.68:
                d = os.path.join(repo_dir, rng.choice(dirs[1:]))
                shutil.rmtree(d, ignore_errors=True)
            elif roll < 0.76:
                ign = os.path.join(repo_dir, rng.choice(dirs),
                                   ".gitignore")
                os.makedirs(os.path.dirname(ign), exist_ok=True)
                with open(ign, "w") as f:
                    f.write(rng.choice(["*.txt\n", "z\n", "deep/\n",
                                        "!b*.txt\n*.txt\n", "**/Δ*\n"]))
            elif roll < 0.84 and os.path.isfile(p):
                os.unlink(p)
                os.symlink(rng.choice(["a.txt", "/nonexistent", "src"]), p)
            elif roll < 0.92:
                subprocess.run(["git", "-C", repo_dir, "reset", "-q"],
                               capture_output=True)
            else:
                src = rand_path()
                subprocess.run(["git", "-C", repo_dir, "mv", "-f", src,
                                rel], capture_output=True)
        except OSError:
            pass  # impossible op for current tree shape — fine, roll on
        got, want = scan(repo_dir)
        assert got is not None, f"declined certifiable state at step {step}"
        assert got == want, \
            f"seed {seed} step {step}: native {got:04b} != git {want:04b}"
        assert_full_agrees(repo_dir)


def test_fallback_rate_on_realistic_corpus(tmp_path, git):
    """The certainty contract punts on exotic repos; this measures how
    often a REALISTIC corpus actually hits the slow path. Every repo here
    is the kind a developer has (benign attributes, packed refs, linked
    worktrees, unicode, symlinks, filemode off, autocrlf=false) — the
    measured fallback rate must stay under 5% so the '0.06 ms typical'
    claim is bounded by data (VERDICT r1 #10)."""
    corpus = []

    def mk(name, setup):
        d = str(tmp_path / name)
        os.makedirs(d)
        git(d, "init", "-b", "main")
        git(d, "config", "user.email", "c@c.c")
        git(d, "config", "user.name", "C")
        with open(os.path.join(d, "README.md"), "w") as f:
            f.write("hello\n")
        git(d, "add", ".")
        git(d, "commit", "-m", "init")
        setup(d)
        corpus.append(d)

    mk("plain", lambda d: None)
    mk("autocrlf-false", lambda d: git(d, "config", "core.autocrlf", "false"))
    mk("filemode-off", lambda d: git(d, "config", "core.filemode", "false"))

    def benign_attrs(d):
        with open(os.path.join(d, ".gitattributes"), "w") as f:
            f.write("*.py diff=python\n*.md linguist-documentation\n")

    mk("benign-attrs", benign_attrs)

    def packed(d):
        git(d, "pack-refs", "--all")
        git(d, "gc", "-q")

    mk("packed", packed)

    def unicode_tree(d):
        os.makedirs(os.path.join(d, "süb dir"))
        with open(os.path.join(d, "süb dir", "ƒile.txt"), "w") as f:
            f.write("x\n")
        git(d, "add", ".")

    mk("unicode", unicode_tree)

    def links(d):
        os.symlink("README.md", os.path.join(d, "link"))
        git(d, "add", ".")
        git(d, "commit", "-m", "link")

    mk("symlinks", links)

    def worktree(d):
        git(d, "worktree", "add", d + "-wt", "-b", "side")

    mk("wt", worktree)

    def dirty(d):
        with open(os.path.join(d, "README.md"), "a") as f:
            f.write("more\n")
        with open(os.path.join(d, "new.txt"), "w") as f:
            f.write("n\n")

    mk("dirty", dirty)

    def detached(d):
        head = subprocess.run(["git", "-C", d, "rev-parse", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
        git(d, "checkout", "-q", head)

    mk("detached", detached)

    native.reset_scan_stats()
    for d in corpus:
        repo = GitRepo.open(d)
        gstatus.status(repo, exclude_submodules=True)  # full-status verdict
        native.quick_dirty(repo.workdir, repo.git_dir, repo.common_dir)
    stats = native.scan_stats()
    total = (stats["status_certain"] + stats["status_fallback"]
             + stats["quick_certain"] + stats["quick_fallback"])
    assert total >= 2 * len(corpus)
    rate = (stats["status_fallback"] + stats["quick_fallback"]) / total
    assert rate < 0.05, f"fallback rate {rate:.1%} on realistic corpus: {stats}"


def test_scan_stats_count_fallbacks(temp_repo, git):
    """The WGIT_FRAME_DIAG telemetry counters must tick on both verdicts."""
    native.reset_scan_stats()
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is not None
    git(temp_repo, "config", "core.autocrlf", "true")
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None
    s = native.scan_stats()
    assert s["quick_certain"] == 1 and s["quick_fallback"] == 1
    assert s["quick_fallback_rate"] == 0.5


def test_tracked_file_replaced_by_directory(temp_repo, git):
    """Porcelain reports a tracked file replaced by a directory as
    deleted (' D') with its contents untracked — full-status mode must
    agree (the walk used to classify it 'T')."""
    os.remove(os.path.join(temp_repo, "README.md"))
    os.makedirs(os.path.join(temp_repo, "README.md"))
    with open(os.path.join(temp_repo, "README.md", "inner.txt"), "w") as f:
        f.write("x\n")
    repo = GitRepo.open(temp_repo)
    truth = porcelain_status(repo)
    os.environ["WGIT_NATIVE_STATUS"] = "1"
    try:
        got = gstatus.status(repo, exclude_submodules=True)
    finally:
        del os.environ["WGIT_NATIVE_STATUS"]
    assert sorted(e.path for e in got.unstaged) == \
        sorted(e.path for e in truth.unstaged)
    assert [e.status.name for e in got.unstaged] == \
        [e.status.name for e in truth.unstaged]
    assert sorted(e.path for e in got.untracked) == \
        sorted(e.path for e in truth.untracked)


def test_bare_boolean_config_key_forces_fallback(temp_repo, git):
    """Git grammar: a valueless `autocrlf` line means TRUE — the scanner
    must refuse (fallback), not skip the key and certify."""
    cfg = os.path.join(temp_repo, ".git", "config")
    with open(cfg, "a") as f:
        f.write("[core]\n\tautocrlf\n")
    repo = GitRepo.open(temp_repo)
    assert native.quick_dirty(repo.workdir, repo.git_dir,
                              repo.common_dir) is None


def test_unreadable_subtree_refuses(temp_repo, git):
    """A subtree the walk cannot open means the scan saw an incomplete
    tree: refuse rather than certify 'clean' (certainty contract)."""
    import stat as _stat

    locked = os.path.join(temp_repo, "locked")
    os.makedirs(locked)
    with open(os.path.join(locked, "hidden.txt"), "w") as f:
        f.write("u\n")
    os.chmod(locked, _stat.S_IWUSR | _stat.S_IXUSR)  # no read permission
    try:
        if os.geteuid() == 0:
            pytest.skip("root bypasses directory permissions")
        repo = GitRepo.open(temp_repo)
        assert native.quick_dirty(repo.workdir, repo.git_dir,
                                  repo.common_dir) is None
    finally:
        os.chmod(locked, 0o755)
