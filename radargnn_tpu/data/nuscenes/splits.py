"""nuScenes scene-name splits.

The reference vendors the full official scene lists from nuscenes-devkit
(`preprocessor/nuscenes/splits.py`, 358 lines of constants). The official
mini splits are embedded here; the full trainval/test lists (1000 scene
names) are loaded at import time from the nuscenes-devkit when installed, or
from a `nuscenes_splits.json` placed next to the dataset — keeping this repo
free of a thousand vendored constants while remaining drop-in compatible.
"""

from __future__ import annotations

import json
import os
from typing import List

# Official v1.0-mini splits (nuScenes devkit `splits.py` mini_train/mini_val).
mini_train: List[str] = [
    "scene-0061", "scene-0553", "scene-0655", "scene-0757",
    "scene-0796", "scene-1077", "scene-1094", "scene-1100",
]
mini_val: List[str] = ["scene-0103", "scene-0916"]


def _load_full_splits():
    try:
        from nuscenes.utils import splits as devkit_splits  # type: ignore
        return (devkit_splits.train_detect, devkit_splits.train_track,
                devkit_splits.val, devkit_splits.test)
    except ImportError:
        pass
    path = os.environ.get("NUSCENES_SPLITS_JSON", "")
    if path and os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return (d.get("train_detect", []), d.get("train_track", []),
                d.get("val", []), d.get("test", []))
    return [], [], [], []


train_detect, train_track, val, test = _load_full_splits()


def require_full_splits() -> None:
    if not (train_detect or train_track or val):
        raise RuntimeError(
            "Full nuScenes trainval splits unavailable: install "
            "nuscenes-devkit or point NUSCENES_SPLITS_JSON at a JSON file "
            "with train_detect/train_track/val/test scene-name lists.")
