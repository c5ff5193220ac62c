"""Accuracy sweep: assemble a grid of simulated genomes and report
contiguity per cell — the framework's equivalent of the reference's NCTC
batch report (/root/reference/README.md:175,
scripts/compute_n50_from_draft.py:8-27 over batch directories), runnable
offline against the simulator instead of downloaded datasets.

One command:  python -m hinge_tpu.cli sweep --out docs/accuracy_sweep
writes <out>.json (machine) and <out>.md (human) with, per cell:
N50, contig count, longest-contig fraction of the genome, assembled-base
fraction, and the assemble() wall.  The grid crosses repeat structure x
coverage x read length; every cell must assemble (cells that raise are
reported as failed rather than aborting the sweep).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

#: (name, repeats builder) — repeat tuples are (src_start, dst_start, len)
REPEAT_PROFILES: List[Tuple[str, callable]] = [
    ("plain", lambda L: ()),
    ("repeat1", lambda L: ((L // 8, L // 2, 3_000),)),
    ("dense", lambda L: ((L // 10, L // 2, 3_000),
                         (L // 5, 7 * L // 10, 2_500),
                         (3 * L // 10, 4 * L // 5, 2_000))),
]

COVERAGES = (15.0, 30.0)
READ_LENS = (4_500, 8_000)


def _cell(genome_len: int, cov: float, rlen: int, repeats, seed: int) -> Dict:
    from hinge_tpu.data.simulator import SimParams, simulate
    from hinge_tpu.graph.analysis import comp_n50
    from hinge_tpu.io.fasta import write_fasta
    from hinge_tpu.pipeline import assemble

    p = SimParams(genome_len=genome_len, coverage=cov, mean_read_len=rlen,
                  std_read_len=max(600, rlen // 5), seed=seed,
                  repeats=repeats)
    genome, reads, rs, ov = simulate(p)
    with tempfile.TemporaryDirectory() as tmp:
        fasta = os.path.join(tmp, "reads.fasta")
        write_fasta(fasta, ((rs.names[i], rs.get_seq(i))
                            for i in range(rs.n_reads)))
        n_reads = rs.n_reads
        del reads, rs, ov
        t0 = time.perf_counter()
        res = assemble(fasta=fasta, workdir=tmp, log=lambda *a: None)
        wall = time.perf_counter() - t0
    lengths = sorted((len(s) for _, s in res["contigs"]), reverse=True)
    longest = lengths[0] if lengths else 0
    return {
        "n_reads": n_reads,
        "n_contigs": len(lengths),
        "n50": comp_n50(lengths),
        "longest_frac": round(longest / genome_len, 3),
        "assembled_frac": round(sum(lengths) / genome_len, 3),
        "wall_s": round(wall, 1),
    }


def run_sweep(genome_len: int = 400_000, seed: int = 0,
              out_prefix: Optional[str] = None,
              log=print) -> Dict:
    cells = []
    for rname, rfn in REPEAT_PROFILES:
        for cov in COVERAGES:
            for rlen in READ_LENS:
                key = f"{rname}/cov{cov:g}/len{rlen}"
                try:
                    m = _cell(genome_len, cov, rlen, rfn(genome_len), seed)
                    m["ok"] = True
                except Exception as e:  # report, don't abort the sweep
                    m = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                m["cell"] = key
                m["repeats"] = rname
                m["coverage"] = cov
                m["read_len"] = rlen
                cells.append(m)
                log(f"[sweep] {key}: " + (
                    f"n50={m['n50']} contigs={m['n_contigs']} "
                    f"longest={m['longest_frac']} ({m['wall_s']}s)"
                    if m["ok"] else m["error"]))
    report = {
        "genome_len": genome_len,
        "seed": seed,
        "date": time.strftime("%Y-%m-%d"),
        "cells": cells,
        "n_ok": sum(1 for c in cells if c["ok"]),
        "n_cells": len(cells),
    }
    if out_prefix:
        with open(out_prefix + ".json", "w") as f:
            json.dump(report, f, indent=1)
        with open(out_prefix + ".md", "w") as f:
            f.write(_to_markdown(report))
        log(f"[sweep] wrote {out_prefix}.json / .md")
    return report


def _to_markdown(report: Dict) -> str:
    lines = [
        f"# Accuracy sweep — {report['genome_len']/1e6:g}Mb genomes, "
        f"seed {report['seed']} ({report['date']})",
        "",
        "Per-cell contiguity of `assemble()` across repeat structure x "
        "coverage x read length (the NCTC-batch-report equivalent, run on "
        "the built-in simulator).  Contig counts/fractions include BOTH "
        "strands per assembled sequence (the pipeline emits forward + "
        "reverse-complement contigs adjacently, like the reference draft "
        "stage), so a perfectly assembled circular genome reads as 2 "
        "contigs and assembled/genome ~ 2.0.",
        "",
        "| cell | reads | contigs | N50 | longest/genome | assembled/genome | wall |",
        "|---|---|---|---|---|---|---|",
    ]
    for c in report["cells"]:
        if c["ok"]:
            lines.append(
                f"| {c['cell']} | {c['n_reads']} | {c['n_contigs']} | "
                f"{c['n50']} | {c['longest_frac']} | {c['assembled_frac']} | "
                f"{c['wall_s']}s |")
        else:
            lines.append(f"| {c['cell']} | — | — | — | — | — | {c['error']} |")
    lines.append("")
    lines.append(f"{report['n_ok']}/{report['n_cells']} cells assembled.")
    lines.append("")
    return "\n".join(lines)
