"""Profile one preset's train step: category table + component attribution.

This is the committed form of the per-round ``_prof_*.py`` drivers that
produced docs/PERF.md — run it to reproduce the attribution numbers:

    python -m diga_tpu.cli.profile_step --preset gta2city_warmup
    python -m diga_tpu.cli.profile_step --preset semiseg_1_8_warmup \
        --extra hrnet_pad=64

It builds the EXACT shipped program (``build_experiment(preset)``, same
path as the train CLIs and bench.py), feeds a synthetic batch, captures a
profiler trace over ``--steps`` steps, and prints

  * the per-op-category device-time table (``utils.profiling.parse_trace``)
    and the top-K single ops (always), and
  * with ``--hlo_out PATH``, the per-component split (model fwd/bwd,
    translator, optimizer/EMA, aug/mix, loss/resize) via compiled-HLO <->
    xplane metadata join (``utils.profiling.attribute_trace``) — NOTE
    this recompiles the program (see the --hlo_out help text).

No datasets needed.  Reference for the methodology: docs/PERF.md "Method".
"""

from __future__ import annotations

import argparse
import json
import os

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--preset", default="gta2city_warmup")
    p.add_argument("--extra", action="append", default=[], metavar="KEY=VALUE",
                   help="preset extra override (repeatable; JSON values)")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top_k", type=int, default=25)
    p.add_argument("--trace_dir", default="/tmp/diga_profile")
    p.add_argument("--hlo_out", default=None,
                   help="ALSO dump optimized HLO and print the component "
                        "attribution.  COSTS A FULL RECOMPILE on the axon "
                        "tunnel: the AOT lower().compile() path does not hit "
                        "the persistent jit compile cache (measured r5: >15 "
                        "min for the warm-up program while the jit path "
                        "replays from cache in ~2 min).  Default: trace-only "
                        "category table, which is cheap on a warm cache.")
    args = p.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import dataclasses

    from ..configs.presets import get_preset
    from ..train.build import build_experiment
    from ..utils.profiling import (attribute_trace, dump_compiled_hlo,
                                   profile_step)
    from ..utils.synth import synth_batch

    extra = {}
    for item in args.extra:
        key, sep, raw = item.partition("=")
        if not sep:
            raise SystemExit(f"--extra expects KEY=VALUE, got {item!r}")
        try:
            extra[key] = json.loads(raw)
        except json.JSONDecodeError:
            extra[key] = raw

    cfg = get_preset(args.preset)
    if extra:
        cfg = dataclasses.replace(cfg, extra={**cfg.extra, **extra})
    state, step, _, _ = build_experiment(cfg)
    batch = synth_batch(cfg)

    hlo = None
    if args.hlo_out:
        hlo = dump_compiled_hlo(step, args.hlo_out, state, batch)
        print(f"compiled HLO -> {hlo}", flush=True)

    holder = {"state": state}

    def one_step():
        holder["state"], metrics = step(holder["state"], batch)
        return metrics

    rep = profile_step(one_step, trace_dir=args.trace_dir, n_steps=args.steps)
    if rep.total_s == 0.0:
        # CPU backends record only host thread spans, no per-op XLA events
        print("[empty device-op report: the trace has no 'XLA Ops' plane — "
              "per-op attribution needs a TPU/GPU backend; the raw trace is "
              f"under {args.trace_dir} for TensorBoard]")
        return
    print(rep.render(top_k=args.top_k))
    if not hlo:
        return
    try:
        att = attribute_trace(args.trace_dir, hlo, n_steps=args.steps)
    except RuntimeError as e:  # no tensorflow protos in this env
        print(f"[attribution skipped: {e}]")
        return
    # attribute_trace already returns seconds/step
    print(f"\ncomponent attribution ({args.steps}-step trace, ms/step):")
    for name, sec in att["components"].items():
        print(f"  {name:<16} {sec * 1e3:8.1f}")
    print(f"  {'unmatched':<16} {att['unmatched'] * 1e3:8.1f}")
    print(f"  {'total':<16} {att['total'] * 1e3:8.1f}")


if __name__ == "__main__":
    main()
