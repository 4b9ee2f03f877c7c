"""Native library + tool tests: the C++ fingerprint agrees with itself and
changes on ref updates; vector_smoke proves seam-free row tiling."""

import os

import pytest

from whisper_git_tpu.gitcore import GitRepo, native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libwgitcore.so not built")


@needs_native
def test_native_fingerprint(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    fp1 = native.ref_fingerprint(repo.git_dir, repo.common_dir)
    assert fp1 is not None and len(fp1) == 32
    assert native.ref_fingerprint(repo.git_dir, repo.common_dir) == fp1
    git(temp_repo, "commit", "--allow-empty", "-m", "tick")
    assert native.ref_fingerprint(repo.git_dir, repo.common_dir) != fp1


@needs_native
def test_native_is_fast(temp_repo):
    import time
    repo = GitRepo.open(temp_repo)
    t0 = time.perf_counter()
    for _ in range(50):
        native.ref_fingerprint(repo.git_dir, repo.common_dir)
    per_call = (time.perf_counter() - t0) / 50 * 1000
    assert per_call < 5.0  # reference states ~0.5 ms; allow slack in CI


def test_vector_smoke(tmp_path):
    from whisper_git_tpu.tools.vector_smoke import run
    result = run(str(tmp_path / "vector_smoke.png"))
    assert os.path.exists(result["out"])
    assert result["max_diff_per_row_vs_single"] <= 2
