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
