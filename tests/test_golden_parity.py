"""Byte-golden parity vs the shim-built reference exonerate.

Golden files in tests/golden/out/ were produced by running the actual
reference binaries (built by tools/refbuild/build.sh, see
tools/refbuild/gen_golden.py) on the argv lists in tests/golden/cases.py.
Here the exonerate_tpu CLIs run the same argv and stdout must match
byte-for-byte after normalizing the Command line/Hostname header.

Regenerate goldens with:  tools/refbuild/build.sh &&
                          python tools/refbuild/gen_golden.py
"""
from __future__ import annotations

import io
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
import cases  # noqa: E402


def _golden_cases():
    out = []
    for name, prog, argv in cases.CASES:
        path = os.path.join(cases.OUTDIR, name + ".txt")
        if os.path.exists(path):
            out.append(pytest.param(name, prog, argv, id=name))
    return out


@pytest.fixture(scope="module", autouse=True)
def fixtures_present():
    cases.make_fixtures()


@pytest.mark.parametrize("name,prog,argv", _golden_cases())
def test_golden(name, prog, argv):
    buf = io.StringIO()
    if prog == "script":
        import tempfile
        from exonerate_tpu.cli.fastautils import main as util_main

        def run_step(tool, step_argv):
            b = io.StringIO()
            try:
                rc = util_main([tool] + list(step_argv), out=b)
            except SystemExit as e:
                rc = 1 if e.code else 0
            return b.getvalue() + (f"[exit {rc}]\n" if rc else "")

        with tempfile.TemporaryDirectory() as tmp:
            got = cases.normalize(cases.run_script(argv, run_step, tmp))
        with open(os.path.join(cases.OUTDIR, name + ".txt")) as f:
            want = f.read()
        assert got == want, _diff(name, want, got)
        return
    if prog == "exonerate":
        from exonerate_tpu.cli.exonerate import main
        rc = main(list(argv), out=buf)
    elif prog == "ipcress":
        from exonerate_tpu.cli.ipcress import main
        rc = main(list(argv), out=buf)
    else:
        from exonerate_tpu.cli.fastautils import main
        rc = main([prog] + list(argv), out=buf)
    assert not rc, f"{name}: exit code {rc}"
    got = cases.normalize(buf.getvalue())
    with open(os.path.join(cases.OUTDIR, name + ".txt")) as f:
        want = f.read()
    assert got == want, _diff(name, want, got)


def _diff(name, want, got):
    import difflib
    diff = "\n".join(list(difflib.unified_diff(
        want.splitlines(), got.splitlines(),
        "reference", "exonerate_tpu", lineterm=""))[:80])
    return f"{name} output mismatch:\n{diff}"
