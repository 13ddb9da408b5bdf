"""Runtime configuration: persistent XLA compilation cache.

TPU compiles of the big synthesis graphs cost minutes on first use (and
this image's remote-compile tunnel amplifies that); caching compiled
executables on disk makes every compile one-time per machine. Called from
tpu_audio.__init__; opt out with TPU_AUDIO_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done or os.environ.get("TPU_AUDIO_NO_COMPILE_CACHE"):
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get(
            "TPU_AUDIO_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "tpu_audio", "xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
