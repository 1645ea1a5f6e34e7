"""Generate byte-golden outputs by running the shim-built reference
binaries (tools/refbuild/build.sh) over tests/golden/cases.py.

Usage: python tools/refbuild/gen_golden.py [case-name-filter ...]
Writes tests/golden/out/<name>.txt (normalized stdout) and prints a
summary.  Cases whose reference run fails are reported and skipped.
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tests", "golden"))

import cases  # noqa: E402

BIN = os.path.join(REPO, "build", "ref", "bin")


def main(filters):
    cases.make_fixtures()
    os.makedirs(cases.OUTDIR, exist_ok=True)
    ok = bad = 0
    for name, prog, argv in cases.CASES:
        if filters and not any(f in name for f in filters):
            continue
        if prog == "script":
            import tempfile

            def run_step(tool, step_argv):
                rr = subprocess.run([os.path.join(BIN, tool)]
                                    + step_argv, capture_output=True,
                                    text=True, timeout=900)
                # nonzero exit text (e.g. fastafetch miss) is part of
                # the behavioral contract
                return rr.stdout + (f"[exit {rr.returncode}]\n"
                                    if rr.returncode else "")

            with tempfile.TemporaryDirectory() as tmp:
                out = cases.normalize(cases.run_script(argv, run_step,
                                                       tmp))
            with open(os.path.join(cases.OUTDIR, name + ".txt"),
                      "w") as f:
                f.write(out)
            print(f"ok   {name} ({len(out)} bytes)")
            ok += 1
            continue
        exe = os.path.join(BIN, "exonerate" if prog == "exonerate" else prog)
        cmd = [exe] + argv
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=900)
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name}")
            bad += 1
            continue
        if r.returncode != 0:
            print(f"FAIL {name}: rc={r.returncode}")
            print("  " + "\n  ".join(r.stderr.strip().splitlines()[-3:]))
            bad += 1
            continue
        out = cases.normalize(r.stdout)
        with open(os.path.join(cases.OUTDIR, name + ".txt"), "w") as f:
            f.write(out)
        print(f"ok   {name} ({len(out)} bytes)")
        ok += 1
    print(f"\n{ok} golden files written, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
