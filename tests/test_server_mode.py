"""End-to-end client/server mode: an in-process server (dataset +
word index built from FASTA) must yield the same alignments through
the line protocol as a local run (ref: exonerate-server.c protocol,
Analysis_Server_run analysis.c:1063-1101)."""
import io
import socket

import pytest

from exonerate_tpu.cli.exonerate import main
from exonerate_tpu.cli.server import ExonerateServer
from exonerate_tpu.db.dataset import dataset_build
from exonerate_tpu.db.index import Index, index_build

CALM = "/root/reference/test/data/cdna/calm.human.dna.fasta"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    esd = str(tmp / "db.esd.npz")
    esi = str(tmp / "db.esi.npz")
    dataset_build([CALM], esd)
    index_build(esd, esi)
    index = Index(esi)
    port = _free_port()
    srv = ExonerateServer(index.dataset, index, port)
    srv.start_background()
    yield f"localhost:{port}"
    srv.shutdown()


def run_cli(argv):
    out = io.StringIO()
    main(argv, out=out)
    return out.getvalue()


def _vulgar(text):
    return sorted(ln for ln in text.splitlines()
                  if ln.startswith("vulgar:"))


def test_server_matches_local(server):
    args = ["--bestn", "1", "--showvulgar", "yes",
            "--showalignment", "no", CALM]
    local = run_cli(args + [CALM])
    remote = run_cli(args + [server])
    assert _vulgar(local), local
    assert _vulgar(remote) == _vulgar(local)


def test_customserver_command(server):
    # --customserver sends a raw command before the session starts
    args = ["--bestn", "1", "--showvulgar", "yes", "--showalignment",
            "no", "--customserver", "version", CALM, server]
    text = run_cli(args)
    assert _vulgar(text)
