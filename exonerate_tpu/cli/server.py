"""exonerate-server: serve a sequence database + word index over TCP
(ref: src/program/exonerate-server.c; protocol lines 209-248).

Text line protocol: help, version, exit, dbinfo, lookup <eid>,
get info|seq|subseq, set query <seq>, set param <k> <v>,
revcomp query|target, get hsps.
"""
from __future__ import annotations

import socket
import socketserver
import sys
import threading

from ..alphabet import Alphabet, AlphabetType, guess_type
from ..db.dataset import Dataset, dataset_build
from ..db.index import Index, index_build
from ..model.match import Match, MatchArgs, MatchType, match_type_find
from ..seeds.hsp import HspArgs, HspParam, HspSet
from ..seeds.wordhood import WordHood
from ..seqio import Sequence
from .. import __version__
from . import args as A

_INT_PARAMS = {
    "seedrepeat": "seed_repeat",
    "dnahspthreshold": "dna_hsp_threshold",
    "proteinhspthreshold": "protein_hsp_threshold",
    "codonhspthreshold": "codon_hsp_threshold",
    "dnawordlimit": "dna_word_limit",
    "proteinwordlimit": "protein_word_limit",
    "codonwordlimit": "codon_word_limit",
    "geneseedthreshold": "geneseed_threshold",
    "geneseedrepeat": "geneseed_repeat",
    "dnahspdropoff": "dna_hsp_dropoff",
    "proteinhspdropoff": "protein_hsp_dropoff",
    "codonhspdropoff": "codon_hsp_dropoff",
}


class Connection:
    def __init__(self, server):
        self.server = server
        self.query: Sequence | None = None
        self.query_type: AlphabetType | None = None
        self.revcomp_target = False
        self.hsp_args = HspArgs()
        self.max_query_span = 0
        self.max_target_span = 0

    # -- command handlers --------------------------------------------------

    def handle(self, line: str) -> str | None:
        words = line.split()
        if not words:
            return ""
        cmd = words[0].lower()
        if cmd == "help":
            return HELP_TEXT
        if cmd == "version":
            return f"version: exonerate-server {__version__}\n"
        if cmd == "exit":
            return None
        if cmd == "dbinfo":
            ds = self.server.dataset
            lens = ds.lengths
            return ("dbinfo: %s %s %d %d %d\n" % (
                ds.types[0] if ds.types else "dna",
                "softmasked", len(ds),
                int(lens.max()) if len(lens) else 0,
                int(lens.sum()) if len(lens) else 0))
        if cmd == "lookup" and len(words) == 2:
            num = self.server.dataset.lookup(words[1])
            if num < 0:
                return f"error: id not found [{words[1]}]\n"
            return f"lookup: {num}\n"
        if cmd == "get" and len(words) >= 3:
            return self._handle_get(words[1].lower(), words[2:])
        if cmd == "get" and len(words) == 2 and words[1] == "hsps":
            return self._get_hsps()
        if cmd == "set" and len(words) >= 3:
            return self._handle_set(words[1].lower(), words[2:])
        if cmd == "revcomp" and len(words) == 2:
            if words[1] == "query":
                if self.query is None:
                    return "error: no query set\n"
                self.query = self.query.revcomp()
                self.revcomp_query = not getattr(self, "revcomp_query",
                                                 False)
                return "ok: query strand %s\n" % (
                    "revcomp" if self.revcomp_query else "forward")
            if words[1] == "target":
                self.revcomp_target = not self.revcomp_target
                return "ok: target strand %s\n" % (
                    "revcomp" if self.revcomp_target else "forward")
        return f"error: unknown command [{line}]\n"

    def _handle_get(self, what, rest) -> str:
        ds = self.server.dataset
        if what == "hsps":
            return self._get_hsps()
        try:
            num = int(rest[0])
        except (ValueError, IndexError):
            return "error: bad sequence num\n"
        if not (0 <= num < len(ds)):
            return f"error: sequence num out of range [{num}]\n"
        if what == "info":
            d = ds.defs[num]
            return "seqinfo: %d %d %s%s%s\n" % (
                int(ds.lengths[num]), int(ds.checksums[num]),
                ds.ids[num], " " if d else "", d or "")
        if what == "seq":
            return "seq: %s\n" % ds.get_sequence(num).data.tobytes(
                ).decode()
        if what == "subseq" and len(rest) == 3:
            start, ln = int(rest[1]), int(rest[2])
            if ln <= 0:
                return f"error: subseq len ({ln}) must be >= 0\n"
            if start < 0 or start + ln > int(ds.lengths[num]):
                return ("error: subsequence beyond seq len [%d]\n"
                        % int(ds.lengths[num]))
            return "subseq: %s\n" % ds.get_subseq(num, start, ln).decode()
        return "error: bad get command\n"

    def _handle_set(self, what, rest) -> str:
        if what == "query":
            seq = "".join(rest)
            qt = guess_type(seq.encode())
            self.query = Sequence("query", None, seq, Alphabet(qt), "+")
            self.query_type = qt
            self.revcomp_query = False
            # (ref: exonerate-server.c:779-781: "ok: <len> <checksum>")
            return "ok: %d %d\n" % (len(seq),
                                     self.query.gcg_checksum())
        if what == "param" and len(rest) == 2:
            name, value = rest[0].lower(), rest[1]
            if name == "querytype":
                self.query_type = (AlphabetType.DNA if value == "dna"
                                   else AlphabetType.PROTEIN)
                return "ok: set\n"
            if name == "maxqueryspan":
                self.max_query_span = int(value)
                return "ok: set\n"
            if name == "maxtargetspan":
                self.max_target_span = int(value)
                return "ok: set\n"
            attr = _INT_PARAMS.get(name)
            if attr:
                setattr(self.hsp_args, attr, int(value))
                return "ok: set\n"
            return f"warning: set param {name} ignored by server\n"
        return "error: bad set command\n"

    def _get_hsps(self) -> str:
        if self.query is None:
            return "error: no query set\n"
        srv = self.server
        ds = srv.dataset
        match_type = match_type_find(
            self.query.alphabet.type,
            AlphabetType.DNA if not srv.index.translated
            else AlphabetType.DNA, False)
        param = HspParam(Match(match_type, MatchArgs()), self.hsp_args)
        param.wordlen = srv.index.wordlen
        wordhood = WordHood.for_param(param)
        seeds_by_target = srv.index.get_hsp_seeds(self.query, wordhood)
        parts = []
        for tid in sorted(seeds_by_target):
            target = ds.get_sequence(tid)
            if self.revcomp_target:
                target = target.revcomp()
            hs = HspSet(self.query, target, param)
            for qpos, tpos in seeds_by_target[tid]:
                if self.revcomp_target:
                    tpos = len(target) - tpos - param.wordlen
                hs.seed(qpos, tpos)
            hs.finalise()
            if hs.hsps:
                seg = ["hspset: %d" % tid]
                for h in hs.hsps:
                    seg.append(" %d %d %d" % (h.query_start,
                                              h.target_start, h.length))
                parts.append("".join(seg))
        if not parts:
            return "hspset: empty\n"
        return "\n".join(parts) + "\n"


HELP_TEXT = (
    "exonerate-server commands:\n"
    "    help    : print this message\n"
    "    version : show version information\n"
    "    exit    : disconnect from server\n"
    "    dbinfo  : show database info\n"
    "    lookup <eid> : get internal from external identifier\n"
    "    get info <iid> : get sequence info\n"
    "    get seq <iid> : get sequence\n"
    "    get subseq <iid> <start> <len> : get subsequence\n"
    "    set query <seq> : set query sequence\n"
    "    get hsps : get hsps against current query\n"
    "    revcomp <query | target>\n"
    "    set param <name> <value>\n"
    "--\n")


class ExonerateServer:
    def __init__(self, dataset: Dataset, index: Index, port: int = 12886,
                 verbosity: int = 0):
        self.dataset = dataset
        self.index = index
        self.port = port
        self.verbosity = verbosity
        self._httpd = None

    def serve_forever(self):
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                conn = Connection(outer)
                while True:
                    raw = self.rfile.readline()
                    if not raw:
                        break
                    reply = conn.handle(raw.decode().strip())
                    if reply is None:
                        self.wfile.write(b"ok: exiting\n")
                        break
                    self.wfile.write(reply.encode())
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._httpd = Server(("0.0.0.0", self.port), Handler)
        self._httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        if self._httpd:
            self._httpd.shutdown()


def main(argv=None, out=None):
    argv = argv if argv is not None else sys.argv[1:]
    out = out or sys.stdout
    p = A.ArgumentParser("exonerate-server",
                         "serve sequence databases for exonerate clients")
    aset = A.ArgumentSet("Server options")
    aset.add(None, "port", "port", "Port number to run server on",
             "12886", A.parse_int, "port")
    aset.add(None, "input", "path", "esd file (or fasta to build from)",
             None, A.parse_string, "input")
    aset.add(None, "proteinquery", None, "Index for protein queries",
             "FALSE", A.parse_boolean, "proteinquery")
    aset.add(None, "maxconnections", "n", "Maximum concurrent connections",
             "4", A.parse_int, "maxconnections")
    aset.add(None, "preload", None, "Preload the database", "TRUE",
             A.parse_boolean, "preload")
    aset.add("V", "verbosity", "level", "Verbosity level", "1",
             A.parse_int, "verbosity")
    p.add_set(aset)
    v = p.parse(argv)
    pos = v.get("_positional", [])
    path = v["input"] or (pos[0] if pos else None)
    if not path:
        raise SystemExit("exonerate-server: need an esd/esi input")
    if path.endswith(".esi") or path.endswith(".esi.npz"):
        index = Index(path)
        dataset = index.dataset
    else:
        # build in-memory from fasta / esd
        import tempfile, os
        tmp = tempfile.mkdtemp()
        esd = path
        if not (path.endswith(".esd") or path.endswith(".esd.npz")):
            esd = os.path.join(tmp, "db.esd.npz")
            dataset_build([path], esd)
        esi = os.path.join(tmp, "db.esi.npz")
        index_build(esd, esi, translated=v["proteinquery"])
        index = Index(esi)
        dataset = index.dataset
    out.write(f"listening on port {v['port']}\n")
    srv = ExonerateServer(dataset, index, v["port"], v["verbosity"])
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
