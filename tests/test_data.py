"""Data-core tests: label maps, normalization, transforms, datasets, pipeline."""

import numpy as np
import pytest
from PIL import Image

from diga_tpu.data import (
    Compose,
    RandomCrop,
    RandomHorizontallyFlip,
    RandomSizedAndCrop,
    BatchLoader,
    cityscapes_dataset,
    gta5_dataset,
    label_maps,
    normalize_image,
    denormalize_image,
    synthetic,
)


class TestLabelMaps:
    def test_cityscapes_lut_roundtrip(self):
        # every mapped id lands on its trainId; everything else on 255
        raw = np.arange(256, dtype=np.uint8)
        out = label_maps.remap_labels(raw, label_maps.CITYSCAPES_LUT)
        for k, v in label_maps.CITYSCAPES_ID_TO_TRAINID.items():
            assert out[k] == v
        unmapped = set(range(256)) - set(label_maps.CITYSCAPES_ID_TO_TRAINID)
        assert all(out[i] == 255 for i in unmapped)

    def test_synthia_is_16_class(self):
        vals = set(label_maps.SYNTHIA_ID_TO_TRAINID.values())
        assert vals == set(range(16))

    def test_mapillary_covers_19(self):
        vals = set(label_maps.MAPILLARY_ID_TO_TRAINID.values())
        assert vals == set(range(19))

    def test_palette_length(self):
        pal = label_maps.make_png_palette(label_maps.CITYSCAPES_COLORS_19)
        assert len(pal) == 768
        assert pal[:3] == [128, 64, 128]

    def test_decode_segmap_matches_reference_loop(self):
        # golden check against the reference's per-class loop semantics
        rng = np.random.default_rng(0)
        ids = rng.choice([0, 5, 18, 255], size=(2, 8, 8))
        out = label_maps.decode_segmap(ids)
        colors = label_maps.CITYSCAPES_COLORS_19
        # reference: class pixels -> color/255; others -> id/255
        assert np.allclose(out[ids == 5], colors[5] / 255.0)
        assert np.allclose(out[ids == 255], 1.0)


class TestNormalize:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        norm = normalize_image(img)
        assert norm.dtype == np.float32
        back = denormalize_image(norm)
        assert np.array_equal(back, img)

    def test_matches_reference_formula(self):
        # reference: CityLoader.py:104-107 (BGR, -mean, /128)
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        img[..., 0] = 10  # R
        img[..., 2] = 30  # B
        out = normalize_image(img)
        mean = np.array((104.00698793, 116.66876762, 122.67891434))
        assert np.allclose(out[0, 0, 0], (30 - mean[0]) / 128.0, atol=1e-5)
        assert np.allclose(out[0, 0, 2], (10 - mean[2]) / 128.0, atol=1e-5)


class TestTransforms:
    def test_random_crop_shape(self):
        img = Image.fromarray(np.zeros((64, 128, 3), dtype=np.uint8))
        mask = Image.fromarray(np.zeros((64, 128), dtype=np.uint8), mode="L")
        aug = Compose([RandomHorizontallyFlip(), RandomCrop([32, 48])])
        out_img, out_mask = aug(img, mask, rng=np.random.default_rng(0))
        assert out_img.shape == (32, 48, 3)
        assert out_mask.shape == (32, 48)

    def test_sized_crop_upscales_small_inputs(self):
        img = Image.fromarray(np.zeros((20, 30, 3), dtype=np.uint8))
        mask = Image.fromarray(np.zeros((20, 30), dtype=np.uint8), mode="L")
        aug = Compose([RandomSizedAndCrop([32, 48])])
        out_img, out_mask = aug(img, mask, rng=np.random.default_rng(0))
        assert out_img.shape == (32, 48, 3)

    def test_flip_is_joint(self):
        arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
        img = Image.fromarray(np.stack([arr] * 3, -1))
        mask = Image.fromarray(arr, mode="L")
        # force a flip by scanning seeds until one flips
        for seed in range(20):
            rng = np.random.default_rng(seed)
            aug = Compose([RandomHorizontallyFlip()])
            oi, om = aug(img, mask, rng=rng)
            assert np.array_equal(oi[..., 0], om)  # stays aligned
            if not np.array_equal(om, arr):
                return
        pytest.fail("flip never triggered")


class TestDatasets:
    def test_gta5_fixture_loads(self, tmp_path):
        root = str(tmp_path / "gta5")
        list_path = synthetic.make_gta5_fixture(root, n=3)
        ds = gta5_dataset(
            root, list_path, resize_hw=(64, 128),
            transform=Compose([RandomHorizontallyFlip(), RandomSizedAndCrop([32, 64])]),
        )
        s = ds.__getitem__(0, rng=np.random.default_rng(0))
        assert s["image"].shape == (32, 64, 3)
        assert s["label"].shape == (32, 64)
        valid = s["label"][s["label"] != 255]
        assert valid.size == 0 or valid.max() < 19

    def test_cityscapes_fixture_loads(self, tmp_path):
        root = str(tmp_path / "city")
        img_list, lbl_list = synthetic.make_cityscapes_fixture(root, n=2)
        ds = cityscapes_dataset(root, img_list, lbl_list, split="val", resize_hw=(64, 128))
        s = ds[0]
        assert s["image"].shape == (64, 128, 3)
        assert s["label"].dtype == np.uint8

    def test_rare_class_acceptance_rule(self, tmp_path):
        root = str(tmp_path / "gta5b")
        list_path = synthetic.make_gta5_fixture(root, n=1)
        ds = gta5_dataset(root, list_path)
        # 3 classes above 2% -> accept
        lbl = np.zeros((10, 10), dtype=np.uint8)
        lbl[:3] = 1
        lbl[3:6] = 2
        assert ds._accept_rare(lbl)
        # 2 classes, one being ignore -> reject
        lbl2 = np.full((10, 10), 255, dtype=np.uint8)
        lbl2[:5] = 0
        assert not ds._accept_rare(lbl2)
        # 2 real classes + tiny ignore -> accept
        lbl3 = np.zeros((10, 10), dtype=np.uint8)
        lbl3[:5] = 1
        lbl3[0, 0] = 255
        assert ds._accept_rare(lbl3)


class TestPipeline:
    def test_batch_loader_batches(self, tmp_path):
        root = str(tmp_path / "gta5")
        list_path = synthetic.make_gta5_fixture(root, n=4)
        ds = gta5_dataset(
            root, list_path, resize_hw=(32, 64),
            transform=Compose([RandomCrop([32, 64])]),
        )
        loader = BatchLoader(ds, batch_size=2, num_workers=2, seed=0)
        it = iter(loader)
        batches = [next(it) for _ in range(3)]
        loader.stop()
        for b in batches:
            assert b["image"].shape == (2, 32, 64, 3)
            assert b["label"].shape == (2, 32, 64)
            assert b["label"].dtype == np.int32

    def test_sampler_position_indexed(self):
        from diga_tpu.data import EpochShuffleSampler

        s = EpochShuffleSampler(10, seed=7)
        # one epoch covers every index exactly once, deterministically
        first = [s.index_at(p) for p in range(10)]
        assert sorted(first) == list(range(10))
        assert first == [s.index_at(p) for p in range(10)]
        # next epoch reshuffles
        second = [s.index_at(p) for p in range(10, 20)]
        assert sorted(second) == list(range(10))
        assert first != second

    def test_host_block_sharding_matches_single_host(self, tmp_path):
        """Layout independence: concat of the per-host loaders' batches ==
        the single-host loader's batch, bit for bit (per-sample
        position-keyed RNG + contiguous per-host blocks).  This is the
        property that makes an N-host run reproduce a 1-host run; the
        2-process test (test_multihost_smoke.py) pins it end to end."""
        from diga_tpu.data import (BatchLoader, Compose, RandomHorizontallyFlip,
                                   RandomSizedAndCrop, gta5_dataset, synthetic)

        root = str(tmp_path / "gta5")
        list_path = synthetic.make_gta5_fixture(root, n=6)

        def make(batch, host_id, host_count):
            ds = gta5_dataset(
                root, list_path, resize_hw=(48, 96),
                transform=Compose([RandomHorizontallyFlip(),
                                   RandomSizedAndCrop([32, 64])]),
            )
            return BatchLoader(ds, batch_size=batch, num_workers=2, seed=11,
                               host_id=host_id, host_count=host_count)

        single = make(4, 0, 1)
        h0, h1 = make(2, 0, 2), make(2, 1, 2)
        it_s, it0, it1 = iter(single), iter(h0), iter(h1)
        for _ in range(4):
            bs, b0, b1 = next(it_s), next(it0), next(it1)
            np.testing.assert_array_equal(
                bs["image"], np.concatenate([b0["image"], b1["image"]], 0))
            np.testing.assert_array_equal(
                bs["label"], np.concatenate([b0["label"], b1["label"]], 0))
        for l in (single, h0, h1):
            l.stop()


class TestLoaderDeterminism:
    def test_same_seed_same_batches_across_worker_counts(self, tmp_path):
        """The threaded loader must be a deterministic function of (seed,
        batch index) regardless of worker count or thread scheduling —
        this is the pipeline's race-freedom contract."""
        from diga_tpu.data import BatchLoader, Compose, RandomCrop, gta5_dataset, synthetic

        root = str(tmp_path / "gta5")
        list_path = synthetic.make_gta5_fixture(root, n=6)
        def make(workers):
            from diga_tpu.data import RandomHorizontallyFlip, RandomSizedAndCrop

            ds = gta5_dataset(
                root, list_path, resize_hw=(48, 96),
                transform=Compose([RandomHorizontallyFlip(),
                                   RandomSizedAndCrop([32, 64])]),
            )
            return BatchLoader(ds, batch_size=2, num_workers=workers, seed=11)

        a, b = make(1), make(4)
        ia, ib = iter(a), iter(b)
        for _ in range(6):
            ba, bb = next(ia), next(ib)
            np.testing.assert_array_equal(ba["image"], bb["image"])
            np.testing.assert_array_equal(ba["label"], bb["label"])
        a.stop(); b.stop()
