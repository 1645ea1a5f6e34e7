"""Cross-implementation client/server interop.

The wire protocol (ref: exonerate-server.c:209-248) is byte-compatible
in both directions: the unmodified C exonerate client aligns through
OUR server, and our client aligns through the shim-built C
exonerate-server.  Both must produce the same vulgar lines as a local
run.
"""
import io
import os
import socket
import subprocess
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, "build", "ref", "bin")
CALM = "/root/reference/test/data/cdna/calm.human.dna.fasta"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "exonerate-server")),
    reason="shim-built reference binaries not present "
           "(tools/refbuild/build.sh)")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _wait_port(port, timeout=20):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            socket.create_connection(("127.0.0.1", port),
                                     timeout=1).close()
            return
        except OSError:
            time.sleep(0.2)
    raise TimeoutError(f"port {port} never opened")


def _vulgar(text):
    return sorted(ln for ln in text.splitlines()
                  if ln.startswith("vulgar:"))


ARGS = ["--bestn", "1", "--showvulgar", "yes", "--showalignment", "no"]


def _our_cli(argv):
    from exonerate_tpu.cli.exonerate import main
    out = io.StringIO()
    rc = main(argv, out=out)
    assert not rc
    return out.getvalue()


def test_our_client_vs_c_server(tmp_path):
    esd = str(tmp_path / "calm.esd")
    esi = str(tmp_path / "calm.esi")
    subprocess.run([os.path.join(REF_BIN, "fasta2esd"), CALM, esd],
                   check=True, capture_output=True, timeout=300)
    subprocess.run([os.path.join(REF_BIN, "esd2esi"), esd, esi],
                   check=True, capture_output=True, timeout=300)
    port = _free_port()
    proc = subprocess.Popen(
        [os.path.join(REF_BIN, "exonerate-server"), esi,
         "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        _wait_port(port)
        remote = _our_cli(ARGS + [CALM, f"localhost:{port}"])
    finally:
        proc.kill()
        proc.wait()
    local = _our_cli(ARGS + [CALM, CALM])
    assert _vulgar(remote) == _vulgar(local)
    assert any("10875" in ln for ln in _vulgar(remote))


def test_c_client_vs_our_server(tmp_path):
    from exonerate_tpu.cli.server import ExonerateServer
    from exonerate_tpu.db.dataset import dataset_build
    from exonerate_tpu.db.index import Index, index_build
    esd = str(tmp_path / "db.esd.npz")
    esi = str(tmp_path / "db.esi.npz")
    dataset_build([CALM], esd)
    index_build(esd, esi)
    index = Index(esi)
    port = _free_port()
    srv = ExonerateServer(index.dataset, index, port)
    srv.start_background()
    try:
        _wait_port(port)
        r = subprocess.run(
            [os.path.join(REF_BIN, "exonerate")] + ARGS
            + [CALM, f"localhost:{port}"],
            capture_output=True, text=True, timeout=300)
    finally:
        srv.shutdown()
    assert r.returncode == 0, r.stderr[-500:]
    assert any("10875" in ln for ln in _vulgar(r.stdout))
