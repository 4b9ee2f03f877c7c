"""whisper_git_tpu — a TPU-native rebuild of the capabilities of
computer-whisperer/whisper-git (see SURVEY.md / ARCHITECTURE.md).

Subpackages:
  gitcore   — git backend (value types, GitRepo, refs/status/diff/hunks)
  engine    — async refresh engine (workers, watcher, debounce, safety nets)
  ui        — retained-mode El tree, layout, theme, lints, SVG dumps
  render    — TPU rasterizer (scene buffers, SDF atlas, pallas kernels)
  ops       — batched geometry/image ops (bezier, lanes, word-diff, resize)
  parallel  — device-mesh sharding of the render pipeline
  app       — WhisperApp / RepoTab state machine + views
  services  — config, tokens, recents, crash log, CI, avatars, AI
  host      — headless screenshot host + frame-loop driver
"""

__version__ = "0.1.0"


def _apply_device_override() -> None:
    """WGIT_DEVICE=cpu|tpu picks the accelerator backend (the analog of the
    reference's WHISPER_GPU override, host.rs:567). Must run before ANY jax
    dispatch — graph layout (ops/) can touch jax well before the renderer
    exists, and the first dispatch locks the platform. Opt-in via env, so
    the import costs nothing when unset."""
    import os

    # JAX_PLATFORMS alone is not authoritative here: the axon TPU plugin
    # registers itself regardless, so re-assert the env choice through
    # jax.config (same dance as __graft_entry__.py).
    explicit = os.environ.get("WGIT_DEVICE")
    want = explicit or os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        # WGIT_DEVICE always wins; JAX_PLATFORMS env only fills in when
        # nobody set jax.config yet (a test harness that already forced a
        # platform through jax.config must not be fought — and updating
        # an initialized config tears down backends and compile caches).
        current = jax.config.jax_platforms
        if explicit:
            if current != want:
                jax.config.update("jax_platforms", want)
        elif not current:
            jax.config.update("jax_platforms", want)
    except Exception as exc:
        import sys

        print(f"wgit: WGIT_DEVICE={want!r} not usable: {exc}",
              file=sys.stderr)


_apply_device_override()
