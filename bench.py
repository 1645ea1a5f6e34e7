"""Benchmark: flagship-model DP throughput on the local accelerator.

Measures the generic anti-diagonal wavefront engine on the est2genome
model (10 states / 24 transitions / shadow lanes — the spliced-alignment
workhorse) over the reference test corpus pair size (2175 x 2175),
plus the 16 x 1 Mb heuristic genome-scan workload end-to-end.
GCUPS = cell updates/s (cells = Q * T per pair).

Resilience (VERDICT r2 weak #1): each section runs independently and
retries once on transient device errors (UNAVAILABLE through the TPU
tunnel); a failing section records an error field instead of killing
the whole benchmark.  Reports BOTH the end-to-end find_batched rate and
the kernel-only rate (pre-staged device inputs, kexp methodology), and
BOTH cold and warm scan times (compile-cache visibility, VERDICT r2
weak #7).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

_TRANSIENT = ("UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED", "INTERNAL")


def _retry(section: str, fn, extras: dict, tries: int = 2, wait: int = 30):
    """Run fn(); on a transient device error, retry once after a pause.
    On final failure record `<section>_error` in extras and return None
    so the remaining sections still emit their metrics."""
    for i in range(tries):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — the bench must survive
            msg = f"{type(exc).__name__}: {exc}"
            transient = any(t in msg for t in _TRANSIENT)
            if i + 1 < tries and transient:
                time.sleep(wait)
                continue
            extras[f"{section}_error"] = msg[:300]
            return None


def main():
    import exonerate_tpu
    exonerate_tpu.enable_compilation_cache()
    import jax
    import numpy as np
    from exonerate_tpu.seqio import iter_fasta
    from exonerate_tpu.model.est2genome import est2genome_create
    from exonerate_tpu.model.data import AlignData
    from exonerate_tpu.engine.region import Region
    from exonerate_tpu.engine import wavefront as wf
    from exonerate_tpu.engine import pallas_wavefront as pw

    platform = jax.default_backend()
    calm = list(iter_fasta(
        "/root/reference/test/data/cdna/calm.human.dna.fasta"))[0]
    calm.strand = "+"
    model = est2genome_create()
    data = AlignData(calm, calm)
    region = Region(0, 0, len(calm), len(calm))
    cells = region.query_length * region.target_length
    extras: dict = {}

    # --- section 1: end-to-end find_batched (the production dispatch
    # path: per-call host prep + memoized H2D + kernel + one fetch) ----
    B, reps = 64, 6
    jobs = [(region, data)] * B

    def _end_to_end():
        pw.find_batched(model, jobs, "region")      # warm compile
        times = []
        res = None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = pw.find_batched(model, jobs, "region")
            times.append(time.perf_counter() - t0)
        assert {r.score for r in res} == {10875}, res
        # min-of-N: per-call tunnel/dispatch jitter (~100-600 ms) is
        # not a device property; the floor is
        return cells / (min(times) / B) / 1e9

    gcups = _retry("e2e", _end_to_end, extras)

    # --- section 2: kernel-only (kexp methodology: inputs pre-staged on
    # device, timed run = launch + single stacked fetch) ---------------
    def _kernel_only():
        import jax.numpy as jnp
        Qp = wf._bucket(region.query_length)
        Tp = wf._bucket(region.target_length)
        inputs, kinds = wf.prepare_inputs(model, region, data,
                                          pad_to=(Qp, Tp),
                                          for_pallas=True)
        arrays, meta = pw.pack_batched_inputs(model, [inputs] * B, kinds,
                                              Qp, Tp)
        flat, names = pw._flatten(arrays)
        maxpos = meta.pop("maxpos", 0)
        minneg = meta.pop("minneg", 0)
        dev = wf._put(tuple(jnp.asarray(a) for a in flat))
        fn = pw.build_pallas_wavefront(
            model, Qp, Tp, "region", kinds, meta, names,
            ring16=pw._ring16_ok(model, Qp, Tp, maxpos),
            fastneg=pw._fastneg_ok(Qp, Tp, maxpos, minneg))
        np.asarray(fn(dev)["out"])                  # warm compile
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(dev)["out"])
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / B
        return ms, cells / (ms / 1e3) / 1e9

    kr = _retry("kernel", _kernel_only, extras)
    if kr is not None:
        extras["kernel_ms_per_pair"] = round(kr[0], 3)
        extras["kernel_gcups"] = round(kr[1], 3)

    # --- baseline: measured single-core C exonerate on the same
    # workload (tools/refbuild/bench_baseline.py) ----------------------
    base_gcups = None
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        with open(measured) as f:
            m = json.load(f)
        mc = m["results"].get("est2genome_exhaustive_2175", {})
        if "mcups" in mc:
            base_gcups = mc["mcups"] / 1e3
    if base_gcups is None:
        from exonerate_tpu.engine import reference
        small = Region(0, 0, 150, 300)
        t0 = time.perf_counter()
        reference.find_score(model, small, data)
        base_gcups = ((small.query_length * small.target_length)
                      / (time.perf_counter() - t0) / 1e9)

    # --- section 3: the honest headline — the heuristic genome-scan
    # workload (16 mutated cDNAs x 1 Mb, est2genome bestn 1) end-to-end
    # through the default pipeline vs the measured single-core C
    # *heuristic* time (18.1 s).  Cold AND warm runs are reported so a
    # device-tier default can't hide its compile cost. ----------------
    if os.environ.get("EXONERATE_TPU_BENCH_SCAN", "1") != "0":
        sr = _retry("scan", _scan_benchmark, extras)
        if sr is not None:
            extras.update(sr)

    # --- section 4: the north-star model (BASELINE.json): 8 mutated
    # CALM proteins x 1 Mb genome, protein2genome heuristic, bestn 1 --
    if os.environ.get("EXONERATE_TPU_BENCH_P2G", "1") != "0":
        pr = _retry("p2g", _p2g_scan_benchmark, extras)
        if pr is not None:
            extras.update(pr)

    # --- section 4b: the north star at device scale (VERDICT r4 #3):
    # 64 mutated CALM proteins x 10 Mb genome — large enough that the
    # per-comparison DPs clear the device floor and batch into kernel
    # dispatches -----------------------------------------------------
    if os.environ.get("EXONERATE_TPU_BENCH_P2G_SCALE", "1") != "0":
        ps = _retry("p2g_scale", _p2g_scale_benchmark, extras)
        if ps is not None:
            extras.update(ps)

    # --- section 5: resident serving throughput (queries/s at 1 chip,
    # the north star's serving metric): our server owns the indexed
    # 1 Mb genome, our client streams the 16 scan queries ------------
    if os.environ.get("EXONERATE_TPU_BENCH_SERVE", "1") != "0":
        sv = _retry("serving", _serving_benchmark, extras)
        if sv is not None:
            extras.update(sv)

    value = gcups if gcups is not None else \
        (kr[1] if kr is not None else extras.get("scan_queries_per_sec"))
    line = {
        "metric": f"est2genome_wavefront_gcups_{platform}",
        "value": round(float(value), 3) if value is not None else None,
        "unit": "GCUPS",
        "vs_baseline": (round(float(value / base_gcups), 1)
                        if value is not None and base_gcups else None),
    }
    line.update(extras)
    print(json.dumps(line))
    return 0


def _scan_benchmark() -> dict:
    """16 x 1 Mb est2genome heuristic scan, end-to-end in-process.
    Returns cold (first run in this process: compiles + caches) and
    warm (second run) seconds."""
    import io
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "refbuild"))
    from bench_baseline import genome_scan_fixture
    qf, tf, nq = genome_scan_fixture()
    from exonerate_tpu.cli.exonerate import main as exo_main
    argv = ["-m", "est2genome", "--bestn", "1", "--maxintron", "20000",
            qf, tf, "--showalignment", "no", "--showvulgar", "yes"]
    t0 = time.perf_counter()
    exo_main(list(argv), out=io.StringIO())
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = io.StringIO()
    exo_main(list(argv), out=out)
    dt = time.perf_counter() - t0
    n_vulgar = sum(1 for ln in out.getvalue().splitlines()
                   if ln.startswith("vulgar:"))
    from exonerate_tpu import observe
    engines = dict(observe.engine_counts)
    c_seconds = None
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        with open(measured) as f:
            m = json.load(f)
        c_seconds = m["results"].get("heuristic_genome_scan",
                                     {}).get("seconds")
    extra = {"scan_cold_seconds": round(cold, 2),
             "scan_seconds": round(dt, 2),
             "scan_queries_per_sec": round(nq / dt, 2),
             "scan_alignments": n_vulgar}
    if engines:
        extra["scan_engines"] = engines
    if c_seconds:
        extra["scan_vs_c_heuristic"] = round(c_seconds / dt, 2)
    return extra


def _p2g_scan_benchmark() -> dict:
    """protein2genome heuristic scan (the BASELINE.json north-star
    model): 8 mutated CALM proteins x the 1 Mb genome, bestn 1,
    end-to-end in-process, vs the measured single-core C time on the
    identical workload (tools/refbuild/bench_baseline.py config 6)."""
    import io
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "refbuild"))
    from bench_baseline import p2g_scan_fixture
    pf, tf, nq = p2g_scan_fixture()
    from exonerate_tpu.cli.exonerate import main as exo_main
    argv = ["-m", "protein2genome", "--bestn", "1",
            "--maxintron", "20000", pf, tf,
            "--showalignment", "no", "--showvulgar", "yes"]
    t0 = time.perf_counter()
    exo_main(list(argv), out=io.StringIO())
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = io.StringIO()
    exo_main(list(argv), out=out)
    dt = time.perf_counter() - t0
    n_vulgar = sum(1 for ln in out.getvalue().splitlines()
                   if ln.startswith("vulgar:"))
    c_seconds = None
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        with open(measured) as f:
            m = json.load(f)
        c_seconds = m["results"].get("p2g_genome_scan", {}).get("seconds")
    extra = {"p2g_scan_cold_seconds": round(cold, 2),
             "p2g_scan_seconds": round(dt, 2),
             "p2g_scan_queries_per_sec": round(nq / dt, 2),
             "p2g_scan_alignments": n_vulgar}
    if c_seconds:
        extra["p2g_scan_vs_c_heuristic"] = round(c_seconds / dt, 2)
    return extra


def _p2g_scale_benchmark() -> dict:
    """North star at device scale: 64 mutated CALM proteins x 10 Mb
    genome, protein2genome bestn 1, vs single-core C on the identical
    workload (bench_baseline.py config 8).  Reports cold and warm
    seconds plus the engine split so the device share is visible."""
    import io
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "refbuild"))
    from bench_baseline import p2g_scale_fixture
    pf, tf, nq = p2g_scale_fixture()
    from exonerate_tpu.cli.exonerate import main as exo_main
    from exonerate_tpu import observe
    argv = ["-m", "protein2genome", "--bestn", "1",
            "--maxintron", "20000", pf, tf,
            "--showalignment", "no", "--showvulgar", "yes"]
    t0 = time.perf_counter()
    exo_main(list(argv), out=io.StringIO())
    cold = time.perf_counter() - t0
    observe.engine_counts.clear()
    t0 = time.perf_counter()
    out = io.StringIO()
    exo_main(list(argv), out=out)
    dt = time.perf_counter() - t0
    engines = dict(observe.engine_counts)
    n_vulgar = sum(1 for ln in out.getvalue().splitlines()
                   if ln.startswith("vulgar:"))
    c_seconds = None
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        with open(measured) as f:
            m = json.load(f)
        c_seconds = m["results"].get("p2g_scale_scan", {}).get("seconds")
    extra = {"p2g_scale_cold_seconds": round(cold, 2),
             "p2g_scale_seconds": round(dt, 2),
             "p2g_scale_queries_per_sec": round(nq / dt, 2),
             "p2g_scale_alignments": n_vulgar}
    if engines:
        extra["p2g_scale_engines"] = engines
    if c_seconds:
        extra["p2g_scale_vs_c_heuristic"] = round(c_seconds / dt, 2)
    return extra


def _serving_benchmark() -> dict:
    """Warm resident-server queries/s (the honest answer to the ~3 s
    CLI startup tax): our ExonerateServer owns the .esd/.esi-indexed
    1 Mb genome in-process; our client mode streams the 16 est2genome
    scan queries against it.  Baseline: the resident C server + C
    client on the byte-identical workload
    (bench_baseline.py config 7)."""
    import io
    import socket
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "refbuild"))
    from bench_baseline import genome_scan_fixture
    qf, tf, nq = genome_scan_fixture()
    from exonerate_tpu.db.dataset import dataset_build
    from exonerate_tpu.db.index import Index, index_build
    esd, esi = tf + ".esd.npz", tf + ".esi.npz"
    if not os.path.exists(esi):
        dataset_build([tf], esd)
        index_build(esd, esi)
    index = Index(esi)
    from exonerate_tpu.cli.server import ExonerateServer
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = ExonerateServer(index.dataset, index, port)
    srv.start_background()
    try:
        time.sleep(0.5)
        from exonerate_tpu.cli.exonerate import main as exo_main
        argv = ["-m", "est2genome", "--bestn", "1", "--maxintron",
                "20000", qf, f"localhost:{port}",
                "--showalignment", "no", "--showvulgar", "yes"]
        t0 = time.perf_counter()
        exo_main(list(argv), out=io.StringIO())
        cold = time.perf_counter() - t0
        best, n_vulgar = None, 0
        for _ in range(3):
            t0 = time.perf_counter()
            out = io.StringIO()
            exo_main(list(argv), out=out)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
            n_vulgar = sum(1 for ln in out.getvalue().splitlines()
                           if ln.startswith("vulgar:"))
        # concurrent clients (VERDICT r4 #5): the server threads per
        # connection (ThreadingTCPServer, the reference's
        # thread-per-connection model, exonerate-server.c:866-877);
        # 4 client PROCESSES — the C baseline's shape (the round-5
        # in-process thread version was GIL-capped at 0.88-0.98x C,
        # BASELINE.md round 5) — each stream 4 queries.  Workers
        # import + warm one untimed pass, signal READY, then a GO
        # barrier starts the timed pass, so interpreter startup (~3 s,
        # a documented limitation vs the C client's ~30 ms) is not
        # billed to the server's concurrent throughput.
        import subprocess
        from bench_baseline import _split_fasta
        parts = _split_fasta(qf, 4)
        worker_src = (
            "import sys, io, time\n"
            "from exonerate_tpu.cli.exonerate import main as exo_main\n"
            "part, server = sys.argv[1], sys.argv[2]\n"
            "argv = ['-m', 'est2genome', '--bestn', '1',\n"
            "        '--maxintron', '20000', part, server,\n"
            "        '--showalignment', 'no', '--showvulgar', 'yes']\n"
            "exo_main(list(argv), out=io.StringIO())\n"
            "print('READY', flush=True)\n"
            "sys.stdin.readline()\n"
            "t0 = time.perf_counter()\n"
            "b = io.StringIO()\n"
            "exo_main(list(argv), out=b)\n"
            "dt = time.perf_counter() - t0\n"
            "nv = sum(1 for ln in b.getvalue().splitlines()\n"
            "         if ln.startswith('vulgar:'))\n"
            "print(f'DONE {dt:.3f} {nv}', flush=True)\n")
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   EXONERATE_TPU_RESOLVE_THREADS="1")
        procs = [subprocess.Popen(
            [sys.executable, "-c", worker_src, part,
             f"localhost:{port}"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, env=env) for part in parts]
        best_c, nv_c = None, 0
        try:
            for p in procs:
                line = p.stdout.readline()
                assert line.strip() == "READY", line
            t0 = time.perf_counter()
            for p in procs:
                p.stdin.write("GO\n")
                p.stdin.flush()
            nvs = []
            for p in procs:
                done = p.stdout.readline().split()
                nvs.append(int(done[2]))
            best_c = time.perf_counter() - t0
            nv_c = sum(nvs)
        finally:
            for p in procs:
                try:
                    p.stdin.close()
                    p.wait(timeout=30)
                except Exception:
                    p.kill()
    finally:
        srv.shutdown()
    extra = {"serving_cold_seconds": round(cold, 2),
             "serving_seconds": round(best, 2),
             "serving_queries_per_sec": round(nq / best, 2),
             "serving_alignments": n_vulgar,
             "serving_concurrent_clients": 4,
             "serving_concurrent_seconds": round(best_c, 2),
             "serving_concurrent_queries_per_sec": round(nq / best_c, 2),
             "serving_concurrent_alignments": nv_c}
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.exists(measured):
        with open(measured) as f:
            m = json.load(f)
        sg = m["results"].get("serving_genome_scan", {})
        c = sg.get("seconds")
        if c:
            extra["serving_vs_c"] = round(c / best, 2)
        cc = sg.get("concurrent_seconds")
        if cc:
            extra["serving_concurrent_vs_c"] = round(cc / best_c, 2)
    return extra


if __name__ == "__main__":
    sys.exit(main())
