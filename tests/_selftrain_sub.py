"""Subprocess body for test_selftrain_harness_runs.

Run in a FRESH python: the selftrain-step XLA CPU compile intermittently
balloons to >100 GB when it happens late in a long pytest process
(observed twice on full-suite runs; never when the process is fresh).
Keeping the compile in its own process makes the suite robust and keeps
identical coverage — same config, same harness, same assertions.

argv: gta_root city_root gta_list img_list lbl_list val_img val_lbl work_dir
Prints "RESULT step=<n> loss=<f> kept=<f> counts=<f>" on success.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    (gta_root, city_root, gta_list, img_list, lbl_list,
     val_img, val_lbl, work_dir) = sys.argv[1:9]

    from diga_tpu.configs.presets import (DataConfig, EvalConfig,
                                          ExperimentConfig, LoaderSpec,
                                          TrainConfig)
    from diga_tpu.train.build import build_experiment
    from diga_tpu.train.loop import run_training

    cfg = ExperimentConfig(
        name="smoke_st",
        stage="selftrain",
        data=DataConfig(
            source_root=gta_root, target_root=city_root,
            source_list=gta_list, target_img_list=img_list,
            target_lbl_list=lbl_list, val_img_list=val_img,
            val_lbl_list=val_lbl,
            pseudo_dir="pseudo", num_workers=2,
            source_streams=(LoaderSpec("gta5", (40, 72), 1),),
            target_streams=(LoaderSpec("cityscapes", (40, 72), 1,
                                       use_pseudo=True),),
        ),
        train=TrainConfig(crop_hw=(32, 64), num_steps=3, eval_every=0,
                          beta=0.3, lambda_distil=0.25,
                          compute_dtype="float32", remat=False),
        eval=EvalConfig(out_hw=(40, 72), ds_hw=(20, 36)),
        extra={"layers": (1, 1, 1, 1)},
    )
    state, step, eval_apply, model = build_experiment(cfg)
    result, state = run_training(cfg, state, step, None,
                                 work_dir=work_dir, log_every=1)
    print(f"RESULT step={int(state.step)} "
          f"loss={result.last_metrics['loss']:.6f} "
          f"kept={result.last_metrics['consensus_kept']:.6f} "
          f"counts={float(np.asarray(state.centroids.counts).sum()):.3f}")


if __name__ == "__main__":
    main()
