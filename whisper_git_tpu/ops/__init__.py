"""Batched numeric ops (JAX) used by the renderer and views:

  bezier   — cubic-bezier eval/split/root-find, batched
  lanes    — commit-graph lane assignment + row geometry
  sdf      — jump-flooding EDT for SDF font atlas generation
  diffword — batched word-level diff highlight ranges
  image    — Lanczos3 resize as separable matmuls
"""
