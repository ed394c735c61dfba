"""Tiny synthetic dataset fixtures for tests and smoke training.

Generates a GTA5- or Cityscapes-shaped directory tree of small PNGs with
known label histograms, so loader/e2e tests run hermetically (the survey's
test plan, SURVEY.md §4).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .label_maps import CITYSCAPES_ID_TO_TRAINID


def _blocky_label(rng: np.random.Generator, h: int, w: int, ids: list[int]) -> np.ndarray:
    """Label map of horizontal bands drawn from ``ids`` (raw labelIds)."""
    n_bands = rng.integers(3, 6)
    bands = rng.choice(ids, size=n_bands, replace=True)
    lbl = np.zeros((h, w), dtype=np.uint8)
    edges = np.linspace(0, h, n_bands + 1).astype(int)
    for b, (y0, y1) in zip(bands, zip(edges[:-1], edges[1:])):
        lbl[y0:y1] = b
    return lbl


def make_gta5_fixture(root: str, n: int = 4, h: int = 64, w: int = 128, seed: int = 0) -> str:
    """images/<name>.png + labels/<name>.png + list file; returns list path."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    raw_ids = list(CITYSCAPES_ID_TO_TRAINID.keys())
    names = []
    for i in range(n):
        name = f"{i:05d}.png"
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lbl = _blocky_label(rng, h, w, raw_ids)
        Image.fromarray(img).save(os.path.join(root, "images", name))
        Image.fromarray(lbl).save(os.path.join(root, "labels", name))
        names.append(name)
    list_path = os.path.join(root, "train.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(names) + "\n")
    return list_path


def make_cityscapes_fixture(
    root: str, n: int = 4, h: int = 64, w: int = 128, seed: int = 1, split: str = "val"
) -> tuple[str, str]:
    """leftImg8bit/<split>/... + gtFine/<split>/...; returns (img_list, lbl_list)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "leftImg8bit", split, "city"), exist_ok=True)
    os.makedirs(os.path.join(root, "gtFine", split, "city"), exist_ok=True)
    raw_ids = list(CITYSCAPES_ID_TO_TRAINID.keys()) + [0]  # 0 -> ignore
    img_names, lbl_names = [], []
    for i in range(n):
        img_name = f"city/{i:05d}_leftImg8bit.png"
        lbl_name = f"city/{i:05d}_gtFine_labelIds.png"
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lbl = _blocky_label(rng, h, w, raw_ids)
        Image.fromarray(img).save(os.path.join(root, "leftImg8bit", split, img_name))
        Image.fromarray(lbl).save(os.path.join(root, "gtFine", split, lbl_name))
        img_names.append(img_name)
        lbl_names.append(lbl_name)
    img_list = os.path.join(root, f"{split}_img.txt")
    lbl_list = os.path.join(root, f"{split}_lbl.txt")
    with open(img_list, "w") as f:
        f.write("\n".join(img_names) + "\n")
    with open(lbl_list, "w") as f:
        f.write("\n".join(lbl_names) + "\n")
    return img_list, lbl_list
