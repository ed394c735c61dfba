"""docs/PARITY_RUNBOOK.md commands must not bit-rot (VERDICT r4 #8).

The runbook is the turnkey procedure for real-data mIoU parity; datasets
and reference checkpoints don't exist in CI, but every command in it can
still be smoke-checked: the module must import and its argparse surface
must accept every long flag the runbook passes.  The day real artifacts
arrive, nothing in the procedure should have drifted.
"""

import os
import re
import subprocess
import sys

import pytest

RUNBOOK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "PARITY_RUNBOOK.md")


def _commands():
    """(module, [long flags]) for every `python -m diga_tpu...` command in
    fenced code blocks; line-continuations are folded first."""
    with open(RUNBOOK) as f:
        text = f.read()
    cmds = []
    for block in re.findall(r"```bash\n(.*?)```", text, re.S):
        folded = block.replace("\\\n", " ")
        for line in folded.splitlines():
            line = line.split("#")[0].strip()
            m = re.match(r"python -m (diga_tpu\.cli\.\w+)\s+(.*)", line)
            if m:
                flags = re.findall(r"(--[\w-]+)", m.group(2))
                cmds.append((m.group(1), flags))
            elif line.startswith("python bench.py"):
                cmds.append(("bench.py", re.findall(r"(--[\w-]+)", line)))
    return cmds


COMMANDS = _commands()


def test_runbook_mentions_commands():
    mods = {m for m, _ in COMMANDS}
    # the runbook must keep covering the full parity procedure
    for required in ("diga_tpu.cli.parity_check", "diga_tpu.cli.evaluate_val",
                     "diga_tpu.cli.pseudolabel_generator",
                     "diga_tpu.cli.calc_centroids", "diga_tpu.cli.train_warm_up",
                     "bench.py"):
        assert required in mods, (required, mods)


@pytest.mark.parametrize("module,flags", COMMANDS,
                         ids=[m for m, _ in COMMANDS])
def test_runbook_command_parses(module, flags):
    repo_root = os.path.dirname(RUNBOOK).rsplit(os.sep, 1)[0]
    if module == "bench.py":
        cmd = [sys.executable, os.path.join(repo_root, "bench.py"), "--help"]
    else:
        cmd = [sys.executable, "-m", module, "--help"]
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        p for p in (repo_root, os.environ.get("PYTHONPATH")) if p))
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                          env=env, cwd=repo_root)
    assert proc.returncode == 0, (module, proc.stderr)
    helptext = proc.stdout
    for flag in flags:
        assert flag in helptext, (module, flag, helptext)
