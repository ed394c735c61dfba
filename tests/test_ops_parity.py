"""Golden parity tests: JAX ops vs torch reference formulas.

torch (CPU) is used ONLY in tests, to evaluate the reference's loss /
resize / metric formulas on fixed tensors and pin our implementations to
them (SURVEY.md §4 test plan).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from diga_tpu.ops import (  # noqa: E402
    cross_entropy2d,
    distillation_loss,
    ohem_cross_entropy,
    resize_bilinear,
    resize_nearest,
    RunningScore,
    laplacian2d,
)

RNG = np.random.default_rng(42)


def rand_logits(b, h, w, c):
    return RNG.normal(size=(b, h, w, c)).astype(np.float32)


def rand_labels(b, h, w, c, p_ignore=0.2):
    lbl = RNG.integers(0, c, size=(b, h, w)).astype(np.int64)
    ignore = RNG.random(size=lbl.shape) < p_ignore
    lbl[ignore] = 255
    return lbl


class TestResize:
    @pytest.mark.parametrize("in_hw,out_hw", [((16, 28), (32, 56)), ((33, 57), (16, 28)), ((8, 8), (25, 13))])
    def test_bilinear_align_corners_matches_torch(self, in_hw, out_hw):
        x = RNG.normal(size=(2, *in_hw, 5)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=True))
        ref = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_bilinear_no_align_corners(self):
        x = RNG.normal(size=(1, 10, 14, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (23, 9), align_corners=False))
        ref = TF.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(23, 9),
            mode="bilinear", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_nearest_matches_torch(self):
        x = RNG.integers(0, 19, size=(2, 11, 17)).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(x), (25, 40)))
        ref = TF.interpolate(torch.from_numpy(x)[:, None], size=(25, 40), mode="nearest")[:, 0].numpy()
        np.testing.assert_array_equal(ours, ref)


class TestCrossEntropy2d:
    def test_matches_reference_normalization(self):
        # reference util/loss.py:48-62: sum NLL over valid / ALL pixel count
        logits = rand_logits(2, 8, 12, 19)
        labels = rand_labels(2, 8, 12, 19)
        ours = float(cross_entropy2d(jnp.asarray(logits), jnp.asarray(labels)))

        t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
        t_labels = torch.from_numpy(labels)
        logp = TF.log_softmax(t_logits, dim=1)
        ref = TF.nll_loss(logp, t_labels, ignore_index=255, reduction="sum")
        ref = (ref / t_labels.numel()).item()
        assert ours == pytest.approx(ref, rel=1e-5)


class TestDistillation:
    def test_matches_reference(self):
        # reference util/loss.py:125-143
        b = 3
        teacher = rand_logits(2 * b, 6, 10, 19)
        student = rand_logits(2 * b, 6, 10, 19)
        ours = float(distillation_loss(jnp.asarray(teacher), jnp.asarray(student), scale=0.5))

        t_t = torch.from_numpy(teacher).permute(0, 3, 1, 2)
        t_s = torch.from_numpy(student).permute(0, 3, 1, 2)
        s_chunks = t_s.chunk(2)
        q_chunks = TF.softmax(t_t, dim=1).chunk(2)
        total = 0.0
        for iq, q in enumerate(q_chunks):
            for v in range(2):
                if v == iq:
                    continue
                loss = torch.sum(-q * TF.log_softmax(s_chunks[v], dim=1), dim=1)
                if iq == 1:
                    loss = loss * 0.5
                total = total + loss.mean()
        assert ours == pytest.approx(total.item(), rel=1e-5)


class TestOhem:
    @pytest.mark.parametrize("min_kept", [10, 50, 100000])
    def test_matches_reference(self, min_kept):
        # reference util/loss.py:89-108
        logits = rand_logits(2, 8, 10, 16)
        labels = rand_labels(2, 8, 10, 16)
        ours = float(
            ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), thresh=0.7, min_kept=min_kept)
        )

        score = torch.from_numpy(logits).permute(0, 3, 1, 2)
        target = torch.from_numpy(labels)
        criterion = torch.nn.CrossEntropyLoss(ignore_index=255, reduction="none")
        pred = TF.softmax(score, dim=1)
        pixel_losses = criterion(score, target).contiguous().view(-1)
        mask = target.contiguous().view(-1) != 255
        tmp_target = target.clone()
        tmp_target[tmp_target == 255] = 0
        pred = pred.gather(1, tmp_target.unsqueeze(1))
        pred, ind = pred.contiguous().view(-1)[mask].contiguous().sort()
        min_value = pred[min(min_kept, pred.numel() - 1)]
        threshold = max(min_value, 0.7)
        pixel_losses = pixel_losses[mask][ind]
        pixel_losses = pixel_losses[pred < threshold]
        ref = pixel_losses.mean().item()
        assert ours == pytest.approx(ref, rel=1e-4)


class TestMetrics:
    def test_confusion_matches_reference_bincount(self):
        n = 19
        gt = rand_labels(3, 16, 16, n)
        pred = RNG.integers(0, n, size=gt.shape)
        rs = RunningScore(n)
        rs.update(gt, pred)
        scores, cls_iu = rs.get_scores()

        # reference _fast_hist (util/metrics.py:32-41)
        mask = (gt >= 0) & (gt < n)
        ref_hist = np.bincount(
            n * gt[mask].astype(int) + pred[mask], minlength=n ** 2
        ).reshape(n, n)
        np.testing.assert_array_equal(np.asarray(rs.confusion), ref_hist)

        iu = np.diag(ref_hist) / (
            ref_hist.sum(axis=1) + ref_hist.sum(axis=0) - np.diag(ref_hist)
        )
        assert scores["mean_iou"] == pytest.approx(np.nanmean(iu))


class TestLaplacian:
    def test_edge_map_shape_and_flat_response(self):
        # flat regions -> zero response; boundaries -> nonzero
        seg = np.zeros((1, 16, 16, 1), dtype=np.float32)
        seg[:, 8:] = 3.0
        out = np.asarray(laplacian2d(jnp.asarray(seg)))
        assert out.shape == seg.shape
        assert np.allclose(out[0, :5], 0.0)
        assert np.abs(out[0, 7:10]).max() > 0.1
