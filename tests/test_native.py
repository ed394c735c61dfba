"""Native host-ops library: build + parity with numpy fallbacks."""

import numpy as np
import pytest

from diga_tpu.utils import native

RNG = np.random.default_rng(0)


def test_library_builds():
    lib = native.get_lib()
    assert lib, "native host-ops library failed to build (g++ available?)"


def test_remap_matches_numpy():
    from diga_tpu.data.label_maps import CITYSCAPES_LUT

    labels = RNG.integers(0, 256, size=(64, 128), dtype=np.uint8)
    out = native.remap_u8(labels, CITYSCAPES_LUT)
    np.testing.assert_array_equal(out, CITYSCAPES_LUT[labels])


def test_normalize_matches_numpy():
    from diga_tpu.data.normalize import IMG_MEAN_BGR, normalize_image

    rgb = RNG.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    out = native.normalize_bgr(rgb, IMG_MEAN_BGR)
    ref = normalize_image(rgb)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fast_hist_matches_numpy():
    n = 19
    gt = RNG.integers(0, n + 2, size=1000).astype(np.int32)
    gt[gt == n + 1] = 255
    pred = RNG.integers(0, n, size=1000).astype(np.int32)
    out = native.fast_hist(gt, pred, n)
    mask = (gt >= 0) & (gt < n)
    ref = np.bincount(n * gt[mask] + pred[mask], minlength=n * n).reshape(n, n)
    np.testing.assert_array_equal(out, ref)


def test_label_histogram():
    labels = RNG.integers(0, 256, size=(100, 100), dtype=np.uint8)
    out = native.label_histogram(labels)
    np.testing.assert_array_equal(out, np.bincount(labels.reshape(-1), minlength=256))
