"""Byte-golden parity with the row-scan SDP tier forced.

EXONERATE_TPU_SDP=device + EXONERATE_TPU_SDP_ROWS=all route every
eligible heuristic comparison through HybridSDPPair with the q-major
row-scan engine (engine/sdp_rows.py) computing the device scores on the
CPU test backend.  Output bytes must match the reference goldens
exactly — same contract as tests/test_golden_device.py for the
anti-diagonal tier.
"""
from __future__ import annotations

import io
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
import cases  # noqa: E402

ROWS_CASES = [
    "est2genome_genomic",
    "est2genome_bestn",
    "coding2genome",
    "cdna2genome_annot",
    "annotation_minus",
    "protein2genome_gff",
    "affine_local_dna_cross",
    "geneseed",
    "refine_region",
    "subopt_no",
    "forcegtag",
    "intron_penalty_opts",
    "bestn_ties",
    "querygff",
    "gapped_no_extension",
]

# fast tier keeps one boundary + one non-boundary case; the row
# engine's traced sweep is compile-heavy on the CPU backend, so the
# rest run in the slow tier
_SLOW = {"protein2genome_gff", "cdna2genome_annot", "annotation_minus",
         "est2genome_bestn", "refine_region", "coding2genome",
         "geneseed", "forcegtag", "subopt_no", "querygff",
         "intron_penalty_opts", "bestn_ties", "gapped_no_extension",
         "affine_local_dna_cross"}


def _params():
    by_name = {name: (prog, argv) for name, prog, argv in cases.CASES}
    out = []
    for name in ROWS_CASES:
        prog, argv = by_name[name]
        path = os.path.join(cases.OUTDIR, name + ".txt")
        if os.path.exists(path):
            marks = [pytest.mark.slow] if name in _SLOW else []
            out.append(pytest.param(name, prog, argv,
                                    id=name, marks=marks))
    return out


@pytest.fixture(scope="module", autouse=True)
def fixtures_present():
    cases.make_fixtures()


@pytest.fixture(autouse=True)
def force_rows(monkeypatch):
    monkeypatch.setenv("EXONERATE_TPU_SDP", "device")
    monkeypatch.setenv("EXONERATE_TPU_SDP_ROWS", "all")


@pytest.mark.parametrize("name,prog,argv", _params())
def test_golden_rows(name, prog, argv):
    from exonerate_tpu.cli.exonerate import main
    buf = io.StringIO()
    rc = main(list(argv), out=buf)
    assert not rc, f"{name}: exit code {rc}"
    got = cases.normalize(buf.getvalue())
    with open(os.path.join(cases.OUTDIR, name + ".txt")) as f:
        want = f.read()
    if got != want:
        import difflib
        diff = "\n".join(list(difflib.unified_diff(
            want.splitlines(), got.splitlines(),
            "reference", "exonerate_tpu[rows]", lineterm=""))[:60])
        raise AssertionError(f"{name} rows-tier mismatch:\n{diff}")
