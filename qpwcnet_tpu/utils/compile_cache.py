"""Persistent XLA compilation cache helper. Full-model TPU compiles take
minutes through the remote-compile tunnel; caching them across processes
makes reruns (bench, apps, tests) near-instant."""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get(
    "QPWCNET_TPU_COMPILE_CACHE", "/root/.cache/qpwcnet_tpu_jax_cache"
)


def enable_compile_cache(path: str | None = None) -> None:
    jax.config.update("jax_compilation_cache_dir", path or DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
