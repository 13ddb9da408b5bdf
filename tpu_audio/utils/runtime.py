"""Runtime configuration: persistent XLA compilation cache.

TPU compiles of the big synthesis graphs cost minutes on first use (and
this image's remote-compile tunnel amplifies that); caching compiled
executables on disk makes every compile one-time per machine. Called from
tpu_audio.__init__; opt out with TPU_AUDIO_NO_COMPILE_CACHE=1.

The cache is restricted to non-CPU backends. jaxlib 0.9.0's XLA:CPU AOT
serialization is unsafe on heterogeneous hosts: serialize can SIGSEGV the
process inside ``compilation_cache.put_executable_and_time`` (observed
reproducibly with shard_map+Pallas executables), and deserialize loads
executables whose recorded machine features (+prefer-no-scatter,
+prefer-no-gather, AMX) mismatch the running host — XLA's own
``cpu_aot_loader`` warns this "could lead to execution errors such as
SIGILL".  A hard signal, not an exception, so no try/except can contain
it; instead ``_install_cpu_cache_guard`` wraps the cache's put/get entry
points and makes them no-ops on CPU backends.  TPU (PJRT plugin)
serialization is unaffected and stays cached.  Set TPU_AUDIO_CACHE_CPU=1
to re-enable CPU caching for debugging.
"""

from __future__ import annotations

import os

_done = False


def _install_cpu_cache_guard() -> None:
    """Make persistent-cache reads/writes no-ops for CPU backends.

    Wraps jax._src.compilation_cache.{put,get}_executable_and_time (the
    single funnel jax._src.compiler uses) so CPU executables are neither
    serialized (SIGSEGV risk) nor deserialized (SIGILL risk). Idempotent.
    """
    if os.environ.get("TPU_AUDIO_CACHE_CPU"):
        return
    from jax._src import compilation_cache as cc

    if getattr(cc, "_tpu_audio_cpu_guard", False):
        return
    cc._tpu_audio_cpu_guard = True

    orig_put = cc.put_executable_and_time
    orig_get = cc.get_executable_and_time

    def put_executable_and_time(cache_key, module_name, executable, backend,
                                compile_time):
        if getattr(backend, "platform", None) == "cpu":
            return None
        return orig_put(cache_key, module_name, executable, backend,
                        compile_time)

    def get_executable_and_time(cache_key, compile_options, backend,
                                executable_devices):
        if getattr(backend, "platform", None) == "cpu":
            return None, None
        return orig_get(cache_key, compile_options, backend,
                        executable_devices)

    cc.put_executable_and_time = put_executable_and_time
    cc.get_executable_and_time = get_executable_and_time


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
        _install_cpu_cache_guard()
    except Exception:
        pass
