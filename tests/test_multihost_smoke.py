"""2-process jax.distributed smoke (VERDICT r1 #8: multi-host claim).

Launches two fresh python processes that initialize the distributed
runtime over a localhost coordinator, build ONE global 4-device mesh
(2 procs x 2 virtual CPU devices), and run a jitted data-parallel step
whose gradient all-reduce crosses the process boundary.  Mirrors the
multi-host recipe documented in parallel/mesh.py.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # quick tier: pytest -m 'not slow'


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_step(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ,
               PYTHONPATH=os.pathsep.join(
                   p for p in (repo_root, os.environ.get("PYTHONPATH")) if p))
    script = os.path.join(os.path.dirname(__file__), "_multihost_sub.py")

    # shared fixtures: both processes see the same dataset and stride it
    # per host (EpochShuffleSampler)
    from diga_tpu.data import synthetic

    root = str(tmp_path / "mh")
    synthetic.make_gta5_fixture(os.path.join(root, "gta"), n=4, h=40, w=72)
    synthetic.make_cityscapes_fixture(os.path.join(root, "city"), n=4,
                                      h=40, w=72, split="train")

    procs = [
        subprocess.Popen([sys.executable, script, coord, "2", str(pid), root],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        assert p.returncode == 0, f"stdout:\n{out}\nstderr:\n{err}"
        outs.append(out)

    losses, hlosses = [], []
    for out in outs:
        m = re.search(r"RESULT loss=(\S+) n_global=(\d+) n_local=(\d+)", out)
        assert m, out
        assert int(m.group(2)) == 4 and int(m.group(3)) == 2
        losses.append(float(m.group(1)))
        h = re.search(r"HARNESS loss=(\S+)", out)
        assert h, out
        hlosses.append(float(h.group(1)))
    # both processes computed the same GLOBAL loss (all-reduce crossed procs)
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
    # ... and the REAL harness (host-sharded loaders -> global batch
    # assembly -> jitted DG step) agrees across processes too
    assert hlosses[0] == pytest.approx(hlosses[1], abs=1e-5)

    # ---- layout independence (VERDICT r3 #5): the SAME fixtures through a
    # 1-process / 4-device layout must produce the SAME step metrics — the
    # loaders' per-sample position-keyed RNG + contiguous host blocks make
    # the global batch sequence identical for any process layout
    # (data/pipeline.py BatchLoader contract)
    coord1 = f"127.0.0.1:{_free_port()}"
    proc1 = subprocess.run(
        [sys.executable, script, coord1, "1", "0", root, "4"],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc1.returncode == 0, f"stdout:\n{proc1.stdout}\nstderr:\n{proc1.stderr}"
    h1 = re.search(r"HARNESS loss=(\S+)", proc1.stdout)
    assert h1, proc1.stdout
    assert float(h1.group(1)) == pytest.approx(hlosses[0], abs=1e-5)
