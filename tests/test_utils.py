"""Utils coverage: metric logger, visualization grids."""

import json
import os

import numpy as np

from diga_tpu.utils.logging import MetricLogger
from diga_tpu.utils.visualize import image_unit_rgb, label_rgb, make_grid, save_grid


class TestMetricLogger:
    def test_jsonl_and_history(self, tmp_path):
        log = MetricLogger(str(tmp_path))
        log.log(0, {"loss": 1.5})
        log.log(50, {"loss": 1.2, "miou": 0.3})
        log.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["loss"] == 1.5
        assert lines[1]["miou"] == 0.3
        assert log.history["loss"] == [(0, 1.5), (50, 1.2)]

    def test_plot_writes_pngs(self, tmp_path):
        log = MetricLogger(str(tmp_path))
        for i in range(3):
            log.log(i, {"loss": 1.0 / (i + 1)})
        log.plot()
        log.close()
        assert os.path.exists(tmp_path / "loss.png")


class TestVisualize:
    def test_image_unit_rgb_range(self):
        x = np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
        out = image_unit_rgb(x)
        assert out.shape == x.shape
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_label_rgb_colors(self):
        lbl = np.zeros((1, 4, 4), np.int32)
        out = label_rgb(lbl)
        np.testing.assert_allclose(out[0, 0, 0], [128 / 255, 64 / 255, 128 / 255])

    def test_grid_layout_and_save(self, tmp_path):
        rows = [np.ones((2, 8, 10, 3)) * 0.5, np.zeros((2, 8, 10, 3))]
        grid = make_grid(rows, pad=1)
        assert grid.shape[0] == 2 * (8 + 2)          # two rows
        assert grid.shape[1] == 2 * (10 + 2)         # two images per row
        path = str(tmp_path / "g" / "grid.jpg")
        save_grid(path, rows)
        assert os.path.exists(path)


class TestSynthBatch:
    """synth_batch (utils/synth.py) feeds bench.py and cli/profile_step —
    shapes/dtypes must match what data.pipeline.BatchLoader emits."""

    def test_selftrain_shapes(self):
        from diga_tpu.configs.presets import get_preset
        from diga_tpu.utils.synth import synth_batch

        cfg = get_preset("gta2city_selftrain")
        b = synth_batch(cfg)
        h, w = cfg.train.crop_hw
        bs = sum(s.batch for s in cfg.data.source_streams)
        bt = sum(s.batch for s in cfg.data.target_streams)
        assert b["s_img"].shape == (bs, h, w, 3)
        assert b["s_lbl"].shape == (bs, h, w) and b["s_lbl"].dtype == np.int32
        assert b["t_img"].shape == (bt, h, w, 3)
        assert b["t_pseudo"].shape == (bt, h, w)
        assert int(np.max(np.asarray(b["s_lbl"]))) < cfg.train.num_classes

    def test_warmup_has_target_iff_tgt_stats_forward(self):
        import dataclasses

        from diga_tpu.configs.presets import get_preset
        from diga_tpu.utils.synth import synth_batch

        cfg = get_preset("gta2city_warmup")
        assert "t_img" in synth_batch(cfg)  # preset default: stats forward on
        off = dataclasses.replace(
            cfg, extra={**cfg.extra, "tgt_stats_forward": False})
        assert "t_img" not in synth_batch(off)
