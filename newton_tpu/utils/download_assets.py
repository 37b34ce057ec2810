"""Asset fetching (reference: utils/download_assets.py:454).

The reference clones the newton-assets git repo into a cache. This
environment has no network egress, so resolution is local-only: a
NEWTON_ASSETS_PATH directory, a local cache, or bundled/system assets.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["download_asset", "get_asset_path"]

_SEARCH_PATHS = [
    os.environ.get("NEWTON_ASSETS_PATH", ""),
    os.path.expanduser("~/.cache/newton_tpu/assets"),
    "/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets",
    "/opt/venv/lib/python3.12/site-packages/dm_control/suite",
]


def get_asset_path(name: str) -> Optional[str]:
    """Resolve an asset by filename across local search paths."""
    for base in _SEARCH_PATHS:
        if not base:
            continue
        cand = os.path.join(base, name)
        if os.path.exists(cand):
            return cand
    return None


def download_asset(name: str, cache_dir: Optional[str] = None) -> str:
    """Reference-compatible entry point. Resolves locally; raises with
    instructions when the asset is absent (no network egress here)."""
    p = get_asset_path(name)
    if p:
        return p
    raise FileNotFoundError(
        f"Asset {name!r} not found locally. Set NEWTON_ASSETS_PATH to a "
        "directory containing it (network fetching is unavailable in this "
        "environment).")
