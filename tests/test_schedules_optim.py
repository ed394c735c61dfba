"""Schedule + optimizer parity tests against the reference formulas and
torch SGD semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diga_tpu.train.optim import sgd_grouped
from diga_tpu.train.schedules import poly_schedule, poly_warmup_schedule


class TestSchedules:
    def test_poly_matches_reference(self):
        # reference: base * (1 - iter/max)^0.9 (util/utils.py:32-33)
        fn = poly_schedule(2.5e-4, 80_000, 0.9)
        for it in (0, 1, 1000, 79_999):
            ref = 2.5e-4 * (1 - it / 80_000) ** 0.9
            # schedule evaluates in fp32 on device
            assert float(fn(it)) == pytest.approx(ref, rel=2e-3)

    def test_warmup_matches_reference(self):
        # reference: linear ramp to warmup then poly (util/utils.py:25-29)
        fn = poly_warmup_schedule(2.5e-4, 60_000, warmup=1000, power=1.0)
        assert float(fn(0)) == 0.0
        assert float(fn(500)) == pytest.approx(2.5e-4 * 0.5)
        assert float(fn(1000)) == pytest.approx(2.5e-4)
        ref = 2.5e-4 * (1 - (2000 - 1000) / 60_000)
        assert float(fn(2000)) == pytest.approx(ref, rel=1e-6)


class TestSGDGrouped:
    def _setup(self):
        params = {
            "backbone_w": jnp.ones((4,)) * 2.0,
            "head_w": jnp.ones((4,)) * 2.0,
            "bn": jnp.ones((4,)) * 2.0,
        }
        labels = {"backbone_w": "backbone", "head_w": "head", "bn": "frozen"}
        opt = sgd_grouped(lambda s: 0.1, labels, momentum=0.9, weight_decay=0.01)
        return params, opt

    def test_matches_torch_sgd(self):
        torch = pytest.importorskip("torch")
        params, opt = self._setup()
        state = opt.init(params)
        grads = {k: jnp.ones((4,)) for k in params}

        t_bb = torch.ones(4, requires_grad=True) * 2.0
        t_bb = t_bb.detach().requires_grad_(True)
        t_head = (torch.ones(4) * 2.0).requires_grad_(True)
        topt = torch.optim.SGD(
            [{"params": [t_bb], "lr": 0.1}, {"params": [t_head], "lr": 1.0}],
            momentum=0.9, weight_decay=0.01,
        )
        p = params
        for _ in range(3):
            upd, state = opt.update(grads, state, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b, p, upd)
            t_bb.grad = torch.ones(4)
            t_head.grad = torch.ones(4)
            topt.step()
        np.testing.assert_allclose(np.asarray(p["backbone_w"]), t_bb.detach().numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p["head_w"]), t_head.detach().numpy(), rtol=1e-6)
        # frozen params untouched
        np.testing.assert_array_equal(np.asarray(p["bn"]), np.full(4, 2.0))

    def test_head_gets_10x_lr(self):
        params, opt = self._setup()
        state = opt.init(params)
        grads = {k: jnp.ones((4,)) for k in params}
        upd, _ = opt.update(grads, state, params)
        # first step: update = -lr*mult*(g + wd*p)
        assert float(upd["head_w"][0]) == pytest.approx(10 * float(upd["backbone_w"][0]))
