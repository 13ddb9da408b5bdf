"""HuggingFace Hub snapshot + cache policy.

Mirrors the reference's shared HubApi with a caches-directory download
location (package/Utils/HubConfiguration.swift:16-37). Local directories
pass through untouched, so offline use (pre-seeded caches, mounted model
dirs) needs no network.
"""

from __future__ import annotations

import os

from tpu_audio.utils.logging import get_logger

_log = get_logger("hub")

CACHE_ROOT = os.environ.get(
    "TPU_AUDIO_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "tpu_audio", "hub"),
)


def snapshot(repo_id: str, matching: list[str] | None = None,
             progress_handler=None) -> str:
    """Resolve repo_id to a local directory, downloading if necessary.

    repo_id may be a filesystem path (returned as-is), or an HF repo id
    fetched via huggingface_hub.snapshot_download into the shared cache.
    """
    if os.path.isdir(repo_id):
        return repo_id
    from huggingface_hub import snapshot_download

    _log.info("snapshot %s (patterns=%s)", repo_id, matching)
    try:
        return snapshot_download(
            repo_id,
            allow_patterns=matching,
            cache_dir=CACHE_ROOT,
        )
    except Exception as e:
        from tpu_audio.api.errors import ModelLoadError

        raise ModelLoadError(
            repo_id,
            f"{type(e).__name__} during download. If offline, pre-seed "
            f"{CACHE_ROOT} (or set TPU_AUDIO_CACHE) with the HF snapshot, "
            f"or pass a local directory as the repo id.") from e
