"""Offline figure/video tool (cli/make_viz) on synthetic fixtures."""

import os

import numpy as np
import pytest
from PIL import Image

from diga_tpu.cli import make_viz
from diga_tpu.data.label_maps import CITYSCAPES_COLORS_19, decode_segmap

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


def _fixture(tmp_path, n=2, h=24, w=32):
    img_root = tmp_path / "imgs"
    pred_dir = tmp_path / "preds"
    img_root.mkdir(); pred_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        rel = f"frame_{i:03d}.png"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(img_root / rel)
        pred = rng.integers(0, 19, (h, w)).astype(np.uint8)
        Image.fromarray(pred).save(pred_dir / f"frame_{i:03d}.png")
        names.append(rel)
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"{x}\n" for x in names))
    return str(img_root), str(pred_dir), str(lst)


def test_colormap_roundtrip():
    lbl = np.arange(19, dtype=np.uint8).reshape(1, 19).repeat(4, axis=0)
    rgb = (decode_segmap(lbl) * 255).astype(np.uint8)
    back = make_viz.colormap_to_label(rgb, CITYSCAPES_COLORS_19)
    np.testing.assert_array_equal(back, lbl)


def test_segm_edges():
    lbl = np.zeros((6, 6), np.uint8)
    lbl[:, 3:] = 5
    e = make_viz.segm_edges(lbl)
    assert e[:, 3].all() and not e[:, 1].any() and not e[:, 5].any()


def test_figure_cli(tmp_path):
    img_root, pred_dir, lst = _fixture(tmp_path)
    out_dir = str(tmp_path / "figs")
    make_viz.main(["figure", "--img_root", img_root, "--img_list", lst,
                   "--pred_dirs", pred_dir, "--out_dir", out_dir, "--edges"])
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2
    fig = np.asarray(Image.open(os.path.join(out_dir, files[0])))
    assert fig.shape[1] > 32 * 2  # image + at least one prediction column


def test_video_cli(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_root, pred_dir, lst = _fixture(tmp_path, n=3)
    out = str(tmp_path / "demo.avi")
    make_viz.main(["video", "--img_root", img_root, "--img_list", lst,
                   "--pred_dirs", pred_dir, "--out", out, "--mode", "side"])
    assert os.path.getsize(out) > 0
    cap = cv2.VideoCapture(out)
    assert cap.isOpened() and int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()
