"""utils/profiling: op categorization, xplane parsing, capture round-trip."""

import pytest

from diga_tpu.utils.profiling import (ProfileReport, op_category, parse_trace,
                                      profile_step)


def test_op_category_families():
    assert op_category("%fusion.13 = ...") == "fusion"
    assert op_category("%convolution.5") == "convolution"
    assert op_category("%copy-start.12") == "copy"
    assert op_category("%reshape.1") == "reshape"
    assert op_category("%all-reduce.2") == "collective"
    assert op_category("%bitcast.9") == "convert"
    # 'conv' is a substring of 'convert' — must not misclassify
    assert op_category("%convert.12 = f32[4]") == "convert"
    assert op_category("%convert_element_type.3") == "convert"
    assert op_category("%weird-op") == "other"


def test_render_is_stable():
    rep = ProfileReport(total_s=0.3, n_steps=3,
                        by_category={"fusion": (0.24, 30), "copy": (0.06, 6)},
                        top_ops=[(0.2, 3, "%fusion.1 = f32[8]")])
    out = rep.render()
    assert "100.0 ms/step" in out
    assert "fusion" in out and "copy" in out


def test_parse_trace_synthetic(tmp_path):
    tf = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    xs = tf.XSpace()
    plane = xs.planes.add(name="/device:TPU:0")
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "%fusion.7 = f32[4]"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "%copy.3 = f32[4]"
    line = plane.lines.add(name="XLA Ops")
    e1 = line.events.add(metadata_id=1, duration_ps=int(2e9))   # 2 ms
    e2 = line.events.add(metadata_id=2, duration_ps=int(1e9))   # 1 ms
    del e1, e2
    # an async line that must NOT be counted
    aline = plane.lines.add(name="Async XLA Ops")
    aline.events.add(metadata_id=2, duration_ps=int(50e9))

    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(xs.SerializeToString())

    rep = parse_trace(str(tmp_path), n_steps=1)
    assert abs(rep.total_s - 3e-3) < 1e-9
    assert abs(rep.by_category["fusion"][0] - 2e-3) < 1e-9
    assert abs(rep.by_category["copy"][0] - 1e-3) < 1e-9
    # grouped by base name (trailing .N index stripped)
    assert rep.top_ops[0][2] == "%fusion"


def test_profile_step_capture(tmp_path):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    x = jnp.ones((64, 64))
    try:
        rep = profile_step(lambda: f(x), trace_dir=str(tmp_path), n_steps=2)
    except RuntimeError as e:
        pytest.skip(f"trace parse unavailable here: {e}")
    assert isinstance(rep, ProfileReport)
    assert rep.render()  # does not crash
