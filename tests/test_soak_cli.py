"""CI-scale run of the convergence-soak CLI (tiny config, CPU).

The full production soak is `python -m diga_tpu.cli.soak --steps 2000`
on the chip; this exercises the same code path end-to-end: fixtures ->
training -> mid-run checkpoint + exact resume -> loss/mIoU assertions ->
curve artifacts.
"""

import os

import numpy as np


def test_soak_fixtures_tiny(tmp_path):
    import diga_tpu.cli.soak as M

    work = str(tmp_path / "soak")
    out = M.main([
        "--preset", "dg_gta5", "--tiny", "--mode", "fixtures",
        "--steps", "80", "--work_dir", work,
    ])
    assert out["tail"] < out["head"]
    assert out["best_miou"] >= out["first_miou"]
    assert np.isfinite(out["tail"])
    # recorded artifacts: metrics + at least the loss curve PNG
    assert os.path.exists(os.path.join(work, "metrics.jsonl"))
    assert os.path.exists(os.path.join(work, "loss.png"))
