"""HuggingFace model resolution: local dir or hub snapshot, plus
``model_type`` detection from config.json.

Rebuild of the reference's ModelUtils (Sources/MLXAudioCore/ModelUtils.swift:
5-173): `resolve_model_type` reads config.json model_type/architectures/
model_version; `resolve_or_download_model` prefers a local path, else a cached
snapshot, else downloads — validating the snapshot and clearing a corrupt
cache once before retrying.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

__all__ = [
    "load_config",
    "resolve_model_type",
    "resolve_or_download_model",
    "clear_cache",
]

_REQUIRED_ANY = ("config.json",)


def load_config(model_dir: str | Path) -> dict:
    path = Path(model_dir) / "config.json"
    with open(path) as f:
        return json.load(f)


def resolve_model_type(config: dict, repo_id: str | None = None) -> str | None:
    """Detect the model family key (reference ModelUtils.swift:5-25):
    ``model_type`` first, then ``architectures[0]``, then ``model_version``;
    falls back to repo-name heuristics handled by the task factories."""
    mt = config.get("model_type")
    if isinstance(mt, str) and mt:
        return mt.lower()
    arch = config.get("architectures")
    if isinstance(arch, list) and arch:
        return str(arch[0]).lower()
    mv = config.get("model_version")
    if isinstance(mv, str) and mv:
        return mv.lower()
    return None


def _snapshot_valid(path: Path, required_files: tuple[str, ...]) -> bool:
    if not path.is_dir():
        return False
    names = {p.name for p in path.iterdir()}
    if not any(r in names for r in required_files):
        return False
    # a config with no weights is a broken snapshot
    has_weights = any(
        n.endswith((".safetensors", ".npz", ".bin")) for n in names
    ) or any(p.suffix == ".safetensors" for p in path.rglob("*"))
    return has_weights or "config.json" not in required_files


def resolve_or_download_model(
    repo_or_path: str | Path,
    required_files: tuple[str, ...] = _REQUIRED_ANY,
    allow_patterns: list[str] | None = None,
    revision: str | None = None,
) -> Path:
    """Resolve a model reference to a local directory
    (reference ModelUtils.swift:64-151).

    Order: existing local path -> HF cache snapshot -> network download.
    On a corrupt cached snapshot, clears it and retries the download once.
    """
    p = Path(os.path.expanduser(str(repo_or_path)))
    if p.exists():
        return p

    repo_id = str(repo_or_path)
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"{repo_id} is not a local path and huggingface_hub is unavailable"
        ) from e

    kwargs = dict(repo_id=repo_id, revision=revision)
    if allow_patterns:
        kwargs["allow_patterns"] = allow_patterns

    # Try cache-only first so offline environments work with a warm cache.
    try:
        path = Path(snapshot_download(local_files_only=True, **kwargs))
        if _snapshot_valid(path, required_files):
            return path
    except Exception:
        pass

    try:
        path = Path(snapshot_download(**kwargs))
    except Exception as e:
        raise RuntimeError(
            f"failed to download {repo_id!r}: {e}. "
            "If this environment has no network access, pass a local "
            "directory containing config.json and *.safetensors."
        ) from e
    if not _snapshot_valid(path, required_files):
        # corrupt snapshot: clear and retry once (ModelUtils.swift:83-147)
        clear_cache(repo_id)
        path = Path(snapshot_download(**kwargs))
        if not _snapshot_valid(path, required_files):
            raise RuntimeError(f"snapshot for {repo_id!r} is incomplete at {path}")
    return path


def clear_cache(repo_id: str) -> None:
    """Remove a repo's cached snapshot (reference clearCaches,
    ModelUtils.swift:153-173)."""
    try:
        from huggingface_hub.constants import HF_HUB_CACHE

        folder = Path(HF_HUB_CACHE) / ("models--" + repo_id.replace("/", "--"))
        if folder.exists():
            shutil.rmtree(folder)
    except Exception:
        pass
