"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised hermetically (the driver validates
the real multi-chip path separately via __graft_entry__.dryrun_multichip).

The REAL-TPU tier (tests/test_tpu_hw.py, @pytest.mark.tpu) is the one
exception: `WGIT_TPU_TESTS=1 pytest -m tpu` leaves the platform alone so
the Pallas kernel, the extended font texture, and the frame caches run on
actual hardware — the code paths CPU CI structurally cannot reach."""

import os
import subprocess

_TPU_TIER = os.environ.get("WGIT_TPU_TESTS") == "1"

if not _TPU_TIER:
    # Hard-set (not setdefault): the session env carries JAX_PLATFORMS=axon
    # (the TPU tunnel), and subprocesses spawned by tests must inherit cpu.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

# The env var alone is NOT enough in this environment: the axon TPU plugin
# registers itself regardless and grabs the backend, silently sending every
# test's compile over the TPU tunnel. jax.config is authoritative.
import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

import tempfile  # noqa: E402

# Hermetic state dir: Project Rewind snapshots (services/rewind.py) must
# never land in the developer's real ~/.local/state during tests.
os.environ["XDG_STATE_HOME"] = tempfile.mkdtemp(prefix="wgit-test-state-")

# Deterministic pixels: pin the dirty-indicator pulse clock so two renders
# of the same state compare byte-for-byte (pixel-exactness tests).
from whisper_git_tpu.app.views.widgets import (  # noqa: E402
    freeze_cursor,
    freeze_pulse,
)

freeze_pulse(0.0)
freeze_cursor(True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs real TPU hardware; run WGIT_TPU_TESTS=1 pytest -m tpu")
    config.addinivalue_line(
        "markers",
        "scale: large-repo budgets (100k commits / 25k files); run "
        "WGIT_SCALE_TESTS=1 pytest -m scale")


def pytest_collection_modifyitems(config, items):
    if _TPU_TIER:
        # TPU-tier session: ONLY tpu-marked tests may run — the CPU
        # force and the 8-virtual-device flag are both off, so letting
        # the normal suite through would ship every compile over the
        # tunnel and break mesh tests (fewer than 8 devices).
        skip = pytest.mark.skip(
            reason="WGIT_TPU_TESTS=1 session runs only @pytest.mark.tpu "
                   "tests (drop the env var for the normal suite)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
        return
    skip = pytest.mark.skip(
        reason="real-TPU tier: run WGIT_TPU_TESTS=1 pytest -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
    if not os.environ.get("WGIT_SCALE_TESTS"):
        skip_scale = pytest.mark.skip(
            reason="scale tier: run WGIT_SCALE_TESTS=1 pytest -m scale")
        for item in items:
            if "scale" in item.keywords:
                item.add_marker(skip_scale)


@pytest.fixture()
def temp_repo(tmp_path):
    """A real throwaway git repo with one initial commit (the reference's
    integration tier never mocks git — SURVEY §4.2)."""
    repo_dir = tmp_path / "repo"
    repo_dir.mkdir()
    _git(repo_dir, "init", "-b", "main")
    _git(repo_dir, "config", "user.email", "test@example.com")
    _git(repo_dir, "config", "user.name", "Test User")
    (repo_dir / "README.md").write_text("hello\n")
    _git(repo_dir, "add", ".")
    _git(repo_dir, "commit", "-m", "initial commit")
    return str(repo_dir)


def _git(cwd, *args):
    env = dict(os.environ, GIT_TERMINAL_PROMPT="0", LC_ALL="C")
    subprocess.run(["git", "-C", str(cwd), *args], check=True,
                   capture_output=True, env=env)


@pytest.fixture()
def git():
    """Helper to run raw git commands in tests."""
    return _git
