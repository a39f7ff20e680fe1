"""Persistent XLA compilation cache (repo-local, gitignored).

The big rasterizer graphs take minutes to compile through the axon
remote-compile tunnel; caching makes warm restarts (and the driver's
bench invocation) start in seconds.
"""

import os

import jax

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: str = _DEFAULT, min_compile_secs: float = 5.0):
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
