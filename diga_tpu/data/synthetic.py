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


def make_synthia_fixture(root: str, n: int = 3, h: int = 64, w: int = 128, seed: int = 2) -> str:
    """RGB/<name>.png + GT/LABELS/<name>.png (uint16 label ids).

    The real SYNTHIA GT is a 3-channel uint16 PNG with the class id in
    channel 0; PIL can't encode that, so the fixture writes uint16
    grayscale — the reader handles both (SYNTHIALoader.py:98 semantics).
    """
    from .label_maps import SYNTHIA_ID_TO_TRAINID

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "RGB"), exist_ok=True)
    os.makedirs(os.path.join(root, "GT", "LABELS"), exist_ok=True)
    ids = list(SYNTHIA_ID_TO_TRAINID.keys())
    names = []
    for i in range(n):
        name = f"{i:07d}.png"
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lbl16 = _blocky_label(rng, h, w, ids).astype(np.uint16)
        Image.fromarray(img).save(os.path.join(root, "RGB", name))
        Image.fromarray(lbl16, mode="I;16").save(
            os.path.join(root, "GT", "LABELS", name))
        names.append(name)
    list_path = os.path.join(root, "train.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(names) + "\n")
    return list_path


def make_flat_fixture(root: str, n: int = 2, h: int = 48, w: int = 64,
                      trainid_labels: bool = True, max_label: int = 19,
                      seed: int = 3) -> tuple[str, str]:
    """Flat images+labels layout used by the BDD/Mapillary loaders."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    img_names, lbl_names = [], []
    for i in range(n):
        img_name = f"images/{i:05d}.jpg"
        lbl_name = f"labels/{i:05d}.png"
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lbl = rng.integers(0, max_label, size=(h, w)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, img_name), quality=95)
        Image.fromarray(lbl).save(os.path.join(root, lbl_name))
        img_names.append(img_name)
        lbl_names.append(lbl_name)
    img_list = os.path.join(root, "val_img.txt")
    lbl_list = os.path.join(root, "val_lbl.txt")
    with open(img_list, "w") as f:
        f.write("\n".join(img_names) + "\n")
    with open(lbl_list, "w") as f:
        f.write("\n".join(lbl_names) + "\n")
    return img_list, lbl_list


def make_pseudo_fixture(city_root: str, img_list_path: str, h: int, w: int,
                        seed: int = 0, dirname: str = "pseudo") -> str:
    """Palette pseudo-label PNGs named like the reference generator's
    output (pseudolabel_generator.py:100-105), one per image in the list.
    Returns the pseudo dir name (relative to city_root)."""
    from .label_maps import CITYSCAPES_COLORS_19, make_png_palette

    rng = np.random.default_rng(seed)
    out = os.path.join(city_root, dirname)
    os.makedirs(out, exist_ok=True)
    palette = make_png_palette(CITYSCAPES_COLORS_19)
    for line in open(img_list_path):
        name = os.path.basename(line.strip())
        if not name:
            continue
        lbl = rng.integers(0, 19, size=(h, w)).astype(np.uint8)
        img = Image.fromarray(lbl).convert("P")
        img.putpalette(palette)
        img.save(os.path.join(out, name))
    return dirname


def make_bdd_reference_fixture(root: str, n: int = 2, h: int = 48, w: int = 64,
                               seed: int = 4) -> tuple[str, str]:
    """Reference-layout BDD100k val fixture: images/val/<id>.jpg +
    gtFine/val/<id>_train_id.png and BARE-ID lists (no extension), the
    format the reference ships (BDDLoader.py:66-67)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images", "val"), exist_ok=True)
    os.makedirs(os.path.join(root, "gtFine", "val"), exist_ok=True)
    ids = []
    for i in range(n):
        bid = f"{i:08x}-00000000"
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lbl = rng.integers(0, 19, size=(h, w)).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "images", "val", bid + ".jpg"), quality=95)
        Image.fromarray(lbl).save(
            os.path.join(root, "gtFine", "val", bid + "_train_id.png"))
        ids.append(bid)
    img_list = os.path.join(root, "val.txt")
    lbl_list = os.path.join(root, "val_label.txt")
    for path in (img_list, lbl_list):
        with open(path, "w") as f:
            f.write("\n".join(ids) + "\n")
    return img_list, lbl_list


def make_mapillary_reference_fixture(root: str, n: int = 2, h: int = 48,
                                     w: int = 64, seed: int = 5) -> tuple[str, str]:
    """Reference-layout Mapillary val fixture: validation/images/<id>.jpg +
    validation/labels/<id>.png and BARE-ID lists
    (MapillaryLoader.py:165-166, set='validation')."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "validation", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "validation", "labels"), exist_ok=True)
    ids = []
    for i in range(n):
        mid = f"fixture_{i:04d}_id"
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        lbl = rng.integers(0, 66, size=(h, w)).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "validation", "images", mid + ".jpg"), quality=95)
        Image.fromarray(lbl).save(
            os.path.join(root, "validation", "labels", mid + ".png"))
        ids.append(mid)
    img_list = os.path.join(root, "val.txt")
    lbl_list = os.path.join(root, "val_label.txt")
    for path in (img_list, lbl_list):
        with open(path, "w") as f:
            f.write("\n".join(ids) + "\n")
    return img_list, lbl_list


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
