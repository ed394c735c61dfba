"""File-list segmentation datasets.

One generic ``SegDataset`` replaces the reference's five near-identical
loader classes (GTA5Loader/CityLoader/SYNTHIALoader/BDDLoader/
MapillaryLoader).  Differences between datasets are data, not code: a path
template, a label LUT, and a couple of behavior flags.

Reference citations:
  * GTA5Loader.py:35-112  (rare-class resampling loop :80-106)
  * CityLoader.py:30-138  (pseudo-label triple loading :62-70,86-138)
  * SYNTHIALoader.py:59-141 (uint16 PNG-FI labels :98)
  * MapillaryLoader.py:133+ / BDDLoader.py:35+

Instead of the reference's ``max_iters`` list-repetition trick
(CityLoader.py:46-48) we use a steps-based infinite sampler with
deterministic per-host sharding (``EpochShuffleSampler``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Sequence

import numpy as np
from PIL import Image

from . import label_maps
from .normalize import IMG_MEAN_BGR, normalize_image
from .transforms import Compose, resize_pair, _to_pil_img, _to_pil_mask


def read_list(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def _default_img_reader(path: str) -> Image.Image:
    """Decode with OpenCV when available (2-3x faster inflate for the big
    Cityscapes/GTA5 PNGs; bit-identical pixels for lossless formats),
    fall back to PIL.  Geometric resampling stays PIL for protocol parity.
    """
    try:
        import cv2

        arr = cv2.imread(path, cv2.IMREAD_COLOR)
        if arr is not None:
            return Image.fromarray(arr[:, :, ::-1])  # BGR -> RGB
    except ImportError:
        pass
    return Image.open(path).convert("RGB")


def _default_lbl_reader(path: str) -> Image.Image:
    return Image.open(path)


def _synthia_lbl_reader(path: str) -> Image.Image:
    """SYNTHIA GT: uint16 multi-channel PNG, class id in channel 0.

    reference: SYNTHIALoader.py:98 (imageio PNG-FI)
    """
    import imageio.v2 as imageio

    arr = np.asarray(imageio.imread(path))
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    return Image.fromarray(arr.astype(np.int32), mode="I")


@dataclasses.dataclass
class SegDataset:
    """Paths + decode + geometric aug + normalize; yields numpy samples.

    Each sample is a dict:
      image:  float32 (H, W, 3) BGR normalized (NHWC layout, see normalize.py)
      label:  uint8   (H, W) trainIds, 255=ignore
      pseudo: uint8   (H, W) trainIds (only when pseudo_dir is set)
      name:   str
    """

    root: str
    img_list: list[str]
    lbl_list: list[str]
    img_template: str = "{name}"
    lbl_template: str = "{name}"
    lut: np.ndarray = dataclasses.field(default_factory=lambda: label_maps.CITYSCAPES_LUT)
    resize_hw: tuple[int, int] | None = None
    transform: Compose | None = None
    mean_bgr: np.ndarray = dataclasses.field(default_factory=lambda: IMG_MEAN_BGR.copy())
    rare_class_resample: bool = False
    pseudo_dir: str | None = None
    img_reader: Callable[[str], Image.Image] = _default_img_reader
    lbl_reader: Callable[[str], Image.Image] = _default_lbl_reader
    # minimum share of pixels for a class to count as "present" in the
    # rare-class resampling test (reference: GTA5Loader.py:100)
    rare_min_frac: float = 0.02
    rare_max_tries: int = 5

    def __post_init__(self):
        assert len(self.img_list) == len(self.lbl_list), (
            f"{len(self.img_list)} images vs {len(self.lbl_list)} labels"
        )

    def __len__(self) -> int:
        return len(self.img_list)

    def img_path(self, i: int) -> str:
        return os.path.join(self.root, self.img_template.format(name=self.img_list[i]))

    def lbl_path(self, i: int) -> str:
        return os.path.join(self.root, self.lbl_template.format(name=self.lbl_list[i]))

    def pseudo_path(self, i: int) -> str:
        base = os.path.basename(self.img_list[i])
        return os.path.join(self.root, self.pseudo_dir, base)

    def _accept_rare(self, label_trainid: np.ndarray) -> bool:
        """Reference acceptance rule: >=3 classes each covering >2% of
        pixels, or exactly 2 of which neither is the ignore class.

        reference: GTA5Loader.py:98-106
        """
        cats, counts = np.unique(label_trainid, return_counts=True)
        frac = counts / counts.sum()
        passing = frac > self.rare_min_frac
        n_pass = int(passing.sum())
        if n_pass >= 3:
            return True
        if n_pass == 2:
            # cats is sorted, so ignore (255) is last when present
            if not (cats[-1] == label_maps.IGNORE_LABEL and frac[-1] > self.rare_min_frac):
                return True
        return False

    def __getitem__(self, index: int, rng: np.random.Generator | None = None) -> dict:
        rng = rng or np.random.default_rng()
        image = self.img_reader(self.img_path(index))
        label = self.lbl_reader(self.lbl_path(index))
        masks = [label]
        if self.pseudo_dir is not None:
            masks.append(_default_lbl_reader(self.pseudo_path(index)))

        if self.resize_hw is not None:
            image, masks = resize_pair(image, masks, self.resize_hw)

        from ..utils import native

        def remap(arr):
            arr = np.asarray(arr)
            if arr.dtype == np.uint8 and len(self.lut) == 256:
                return native.remap_u8(arr, self.lut)  # C fast path
            return label_maps.remap_labels(arr, self.lut)

        if self.transform is not None:
            tries = self.rare_max_tries if self.rare_class_resample else 1
            for _ in range(tries):
                out = self.transform(image, *masks, rng=rng)
                img_np, lbl_np = out[0], remap(out[1])
                if not self.rare_class_resample or self._accept_rare(lbl_np):
                    break
            rest = out[2:]
        else:
            img_np = np.array(image)
            lbl_np = remap(np.array(masks[0]))
            rest = tuple(np.array(m) for m in masks[1:])

        if img_np.dtype == np.uint8 and img_np.ndim == 3:
            image_out = native.normalize_bgr(img_np, self.mean_bgr)  # fused C path
        else:
            image_out = normalize_image(img_np, self.mean_bgr)
        sample = {
            "image": image_out,
            "label": lbl_np.astype(np.uint8),
            "name": self.img_list[index],
        }
        if self.pseudo_dir is not None:
            # pseudo PNGs store trainIds directly (palette-P format);
            # out-of-range ids -> 255.  reference: CityLoader.py:130-132
            sample["pseudo"] = label_maps.remap_labels(
                rest[0], label_maps.IDENTITY19_LUT
            ).astype(np.uint8)
        return sample


# ---------------------------------------------------------------------------
# Dataset constructors (path layouts from the reference loaders)
# ---------------------------------------------------------------------------

def gta5_dataset(root: str, list_path: str, **kw) -> SegDataset:
    """GTA5: images/<name>, labels/<name>.  reference: GTA5Loader.py:54-56"""
    names = read_list(list_path)
    kw.setdefault("rare_class_resample", True)
    return SegDataset(
        root=root, img_list=names, lbl_list=names,
        img_template="images/{name}", lbl_template="labels/{name}",
        lut=label_maps.GTA5_LUT, **kw,
    )


def cityscapes_dataset(
    root: str, img_list_path: str, lbl_list_path: str, split: str = "val", **kw
) -> SegDataset:
    """Cityscapes: leftImg8bit/<split>/<name>, gtFine/<split>/<name>.

    reference: CityLoader.py:60-61
    """
    return SegDataset(
        root=root,
        img_list=read_list(img_list_path),
        lbl_list=read_list(lbl_list_path),
        img_template=f"leftImg8bit/{split}/{{name}}",
        lbl_template=f"gtFine/{split}/{{name}}",
        lut=label_maps.CITYSCAPES_LUT,
        **kw,
    )


def synthia_dataset(root: str, list_path: str, **kw) -> SegDataset:
    """SYNTHIA: RGB/<name>, GT/LABELS/<name>.  reference: SYNTHIALoader.py:80-82"""
    names = read_list(list_path)
    kw.setdefault("rare_class_resample", True)
    return SegDataset(
        root=root, img_list=names, lbl_list=names,
        img_template="RGB/{name}", lbl_template="GT/LABELS/{name}",
        lut=label_maps.SYNTHIA_LUT, lbl_reader=_synthia_lbl_reader, **kw,
    )


def _bare_ids(names: list[str]) -> bool:
    """The reference ships BDD/Mapillary lists as bare ids (no extension,
    e.g. ``a59131a5-00000000``); its loaders expand them with hard-coded
    templates.  Lists with real relative paths keep the plain layout."""
    return bool(names) and "." not in os.path.basename(names[0])


def bdd_dataset(root: str, img_list_path: str, lbl_list_path: str,
                split: str = "val", **kw) -> SegDataset:
    """BDD100k (labels already trainIds).  reference: BDDLoader.py:35+

    Accepts either full relative paths or the reference's bare-id lists
    (expanded as images/<split>/<id>.jpg + gtFine/<split>/<id>_train_id.png,
    BDDLoader.py:66-67).
    """
    imgs, lbls = read_list(img_list_path), read_list(lbl_list_path)
    tpl = {}
    if _bare_ids(imgs):
        tpl = dict(img_template=f"images/{split}/{{name}}.jpg",
                   lbl_template=f"gtFine/{split}/{{name}}_train_id.png")
    return SegDataset(
        root=root, img_list=imgs, lbl_list=lbls,
        lut=label_maps.BDD_LUT, **tpl, **kw,
    )


def mapillary_dataset(root: str, img_list_path: str, lbl_list_path: str,
                      split: str = "validation", **kw) -> SegDataset:
    """Mapillary Vistas (66 -> 19 classes).  reference: MapillaryLoader.py:133+

    Accepts either full relative paths or the reference's bare-id lists
    (expanded as <split>/images/<id>.jpg + <split>/labels/<id>.png with
    split='validation', MapillaryLoader.py:165-166 + the DG evaluator's
    set='validation' at evaluate_val.py:75).
    """
    imgs, lbls = read_list(img_list_path), read_list(lbl_list_path)
    tpl = {}
    if _bare_ids(imgs):
        tpl = dict(img_template=f"{split}/images/{{name}}.jpg",
                   lbl_template=f"{split}/labels/{{name}}.png")
    return SegDataset(
        root=root, img_list=imgs, lbl_list=lbls,
        lut=label_maps.MAPILLARY_LUT, **tpl, **kw,
    )


# ---------------------------------------------------------------------------
# Sampling / batching
# ---------------------------------------------------------------------------

class EpochShuffleSampler:
    """Deterministic infinite POSITION-INDEXED sample stream, shuffled per
    epoch.  Replaces the reference's max_iters list-repetition
    (CityLoader.py:46-48) with O(1) memory.

    ``index_at(p)`` maps global stream position p -> dataset index
    (epoch p // n, slot p % n of that epoch's permutation).  Host sharding
    lives in BatchLoader, which assigns each host a CONTIGUOUS block of
    every global batch — so the global batch sequence (and with the
    per-sample position-keyed aug RNG, its exact pixels) is IDENTICAL for
    any process layout: an N-host run reproduces the 1-host run bit for
    bit (tests/test_multihost_smoke.py pins this against a real
    2-process run).
    """

    def __init__(self, n: int, seed: int = 0, shuffle: bool = True,
                 host_id: int = 0, host_count: int = 1):
        self.n = n
        self.seed = seed
        self.shuffle = shuffle
        self.host_id = host_id        # kept for introspection; BatchLoader
        self.host_count = host_count  # does the block-sharding math
        self._orders: dict[int, np.ndarray] = {}

    def _order(self, epoch: int) -> np.ndarray:
        # tiny per-epoch cache; GIL-safe (worst case: duplicate compute)
        order = self._orders.get(epoch)
        if order is None:
            order = np.arange(self.n)
            if self.shuffle:
                np.random.default_rng((self.seed, epoch)).shuffle(order)
            self._orders = {epoch: order}  # keep only the current epoch
        return order

    def index_at(self, position: int) -> int:
        epoch, slot = divmod(position, self.n)
        return int(self._order(epoch)[slot])

    def __iter__(self):
        p = 0
        while True:
            yield self.index_at(p)
            p += 1


def collate(samples: Sequence[dict]) -> dict:
    """Stack sample dicts into batched numpy arrays (labels -> int32)."""
    out = {"image": np.stack([s["image"] for s in samples]).astype(np.float32)}
    out["label"] = np.stack([s["label"] for s in samples]).astype(np.int32)
    if "pseudo" in samples[0]:
        out["pseudo"] = np.stack([s["pseudo"] for s in samples]).astype(np.int32)
    out["name"] = [s["name"] for s in samples]
    return out
