"""On-device step profiling: trace capture + XLA-op breakdown report.

The reference has no tracing at all (SURVEY.md §5.1 — wall-of-print +
tqdm).  Here, ``run_training(profile_steps=...)`` captures a
``jax.profiler`` trace; this module turns that raw trace into an
actionable report without TensorBoard: per-category device-time totals
(fusion/convolution/copy/reshape/...) and the top op groups, averaged
per step.

Notes that shape the implementation (measured on the TPU tunnel):
  * only the serialized ``XLA Ops`` trace line reflects wall time — the
    ``Async XLA Ops`` line records overlapped DMA (copy-start/copy-done)
    whose durations sum to several x the step time and must not be
    attributed;
  * xplane protos are parsed with tensorflow's bundled
    ``tsl.profiler`` schema when tensorflow is present; otherwise the
    capture still works and the report degrades with a clear message.
"""

from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from dataclasses import dataclass, field


def op_category(op_name: str) -> str:
    """Coarse XLA op family from an HLO instruction name."""
    n = op_name.lower().lstrip("%")
    if "fusion" in n:
        return "fusion"
    if n.startswith("copy") or ".copy" in n or "copy-start" in n or "copy-done" in n:
        return "copy"
    # convert before conv: "conv" is a substring of "convert"
    if "bitcast" in n or "convert" in n:
        return "convert"
    if "convolution" in n or "conv" in n:
        return "convolution"
    if "reshape" in n:
        return "reshape"
    if "transpose" in n:
        return "transpose"
    if "dot" in n:
        return "dot"
    if "all-reduce" in n or "reduce-scatter" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "dynamic-update-slice" in n or "dynamic-slice" in n or "slice" in n:
        return "slice"
    return "other"


@dataclass
class ProfileReport:
    """Aggregated device-op times from one trace (seconds, per capture)."""

    total_s: float = 0.0
    by_category: dict = field(default_factory=dict)        # name -> (sec, count)
    top_ops: list = field(default_factory=list)            # [(sec, count, name)]
    n_steps: int = 1

    def render(self, top_k: int = 25) -> str:
        n = max(self.n_steps, 1)
        lines = [f"device op time: {self.total_s / n * 1e3:.1f} ms/step "
                 f"(over {n} steps)"]
        lines.append(f"{'category':14s} {'ms/step':>9s} {'count/step':>11s}")
        for c, (t, cnt) in sorted(self.by_category.items(), key=lambda kv: -kv[1][0]):
            lines.append(f"{c:14s} {t / n * 1e3:9.2f} {cnt / n:11.1f}")
        lines.append(f"top {top_k} op groups (ms/step):")
        for t, cnt, name in self.top_ops[:top_k]:
            lines.append(f"{t / n * 1e3:9.3f}  x{cnt / n:<7.1f} {name[:100]}")
        return "\n".join(lines)


def _find_xplane(trace_dir: str) -> str | None:
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        return None
    return max(files, key=os.path.getmtime)


def parse_trace(trace_dir: str, n_steps: int = 1) -> ProfileReport:
    """Aggregate the newest xplane trace under ``trace_dir``.

    Requires tensorflow (for the xplane proto schema); raises a
    RuntimeError naming the missing piece otherwise.
    """
    path = _find_xplane(trace_dir)
    if path is None:
        raise RuntimeError(f"no *.xplane.pb found under {trace_dir}")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except Exception as e:  # pragma: no cover - env without tensorflow
        raise RuntimeError(
            "parsing xplane traces needs tensorflow's tsl.profiler protos "
            f"(import failed: {e}); the raw trace is still at {path} and "
            "can be opened in TensorBoard's profile plugin"
        ) from e

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    rep = ProfileReport(n_steps=n_steps)
    cat = defaultdict(lambda: [0.0, 0])
    ops = defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        pn = plane.name.lower()
        if "tpu" not in pn and "gpu" not in pn and "device" not in pn:
            continue
        if "host" in pn:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            # serialized op line only; 'Async XLA Ops' overlaps compute
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                rep.total_s += dur
                c = cat[op_category(name)]
                c[0] += dur
                c[1] += 1
                base = re.sub(r"\.\d+$", "", name.split(" = ")[0])
                o = ops[base]
                o[0] += dur
                o[1] += 1
    rep.by_category = {k: (v[0], v[1]) for k, v in cat.items()}
    rep.top_ops = sorted(((t, c, n) for n, (t, c) in ops.items()), reverse=True)
    return rep


def profile_step(step_fn, *args, trace_dir: str = "/tmp/diga_profile",
                 n_steps: int = 3, warmup: int = 2) -> ProfileReport:
    """Run ``step_fn(*args)`` under a profiler trace and return the report.

    ``step_fn`` must be self-contained (e.g. a closure re-feeding its own
    outputs); it is called ``warmup`` times uncaptured, then ``n_steps``
    times inside one trace.
    """
    import jax

    out = None
    for _ in range(warmup):
        out = step_fn(*args)
    if out is not None:
        jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            out = step_fn(*args)
        jax.block_until_ready(out)
    return parse_trace(trace_dir, n_steps=n_steps)


# --------------------------------------------------------------------------
# Component attribution: join HLO metadata op paths with the trace
# (the round-1 `_prof_attrib.py` method, promoted; NOTES_r1.md records the
# numbers it produced: model fwd/bwd, translator, optimizer/EMA splits)
# --------------------------------------------------------------------------

def dump_compiled_hlo(jitted_fn, out_path: str, *args, **kwargs) -> str:
    """Compile ``jitted_fn(*args)`` and write its optimized HLO text."""
    txt = jitted_fn.lower(*args, **kwargs).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    return out_path


def load_hlo_op_paths(hlo_path: str) -> dict:
    """HLO instruction name -> jax metadata op_name path."""
    meta = {}
    pat = re.compile(r"^\s*(%?\S+) = .*metadata=\{op_name=\"([^\"]*)\"")
    with open(hlo_path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                meta[m.group(1).lstrip("%")] = m.group(2)
    return meta


def default_component(op_path: str) -> str:
    """Map a jax op_name path to a coarse model component."""
    p = op_path
    grad = "transpose(" in p
    if "ImgEncoder" in p or "ImgDecoder" in p:
        return "translator_fwd"
    if "DeepLabV2" in p or "HRNet" in p:
        # teacher vs student share module paths; transpose ops = backward
        return "model_bwd" if grad else "model_fwd"
    for key in ("sgd", "ema", "add_decayed", "trace_update", "apply_updates",
                "scale_by", "masked", "/update/"):
        if key in p:
            return "optimizer_ema"
    if "photometric" in p or "crdomix" in p or "hsv" in p:
        return "aug_mix"
    if ("distill" in p or "cross_entropy" in p or "log_softmax" in p
            or "resize" in p):
        return "loss_resize"
    return "misc"


def attribute_trace(trace_dir: str, hlo_path: str, n_steps: int = 1,
                    component_fn=None) -> dict:
    """Per-component device seconds/step from a trace + compiled HLO.

    Returns {"total": s, "components": {name: s}, "unmatched": s}; also
    usable on CPU traces (plane name matching falls back to any plane
    with an 'XLA Ops' line).
    """
    component_fn = component_fn or default_component
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except Exception as e:  # pragma: no cover - env without tensorflow
        raise RuntimeError(
            "attribute_trace needs tensorflow's tsl.profiler protos "
            f"(import failed: {e})") from e

    meta = load_hlo_op_paths(hlo_path)
    path = _find_xplane(trace_dir)
    if path is None:
        raise RuntimeError(f"no *.xplane.pb found under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    comp: dict = defaultdict(float)
    unmatched = 0.0
    total = 0.0
    for plane in xs.planes:
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                inst = name.split(" = ")[0].strip().lstrip("%")
                dur = ev.duration_ps / 1e12
                total += dur
                op_path = meta.get(inst)
                if op_path is None:
                    unmatched += dur
                else:
                    comp[component_fn(op_path)] += dur
    n = max(n_steps, 1)
    return {
        "total": total / n,
        "components": {k: v / n for k, v in
                       sorted(comp.items(), key=lambda kv: -kv[1])},
        "unmatched": unmatched / n,
    }
