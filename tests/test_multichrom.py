"""Multi-chromosome linear-genome simulation + the true yeast_W303 profile
end-to-end (demo/yeast_W303_demo/run.sh + its nominal.ini: del_telomere=1,
aggressive_pruning=1, draft-path consumes G3.graphml).

The simulator lays out >=3 LINEAR chromosomes with identical tandem-repeat
telomeric blocks at every end, so the filter stage sees the real yeast
signals: telomeric pileups from all 2C ends (cov.flag, filter.cpp:757-765)
and reads self-aligning inside the tandem block (self.flag, :537-561)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from hinge_tpu.data.simulator import (
    SimParams, chrom_offsets, simulate, telomere_regions,
)
# the REAL yeast_W303 demo ini (demo/yeast_W303_demo/nominal.ini) — note it
# sets the SINGULAR del_telomere key, which filter.cpp:406 reads for flag
# writing, while hinging.cpp:803 / pruning_and_clipping.py:1268 read the
# PLURAL del_telomeres (absent here): the telomere-kill and the (20,20)
# clip profile do NOT trigger in the actual demo.  aggressive_pruning=1
# still produces and consumes G3.graphml.
YEAST_DEMO_INI = """\
[filter]
length_threshold = 1000;
quality_threshold = 0.23;
n_iter = 3; // filter iteration
aln_threshold = 1000;
min_cov = 5;
cut_off = 300;
theta = 300;
use_qv = true;

[running]
n_proc = 12;

[draft]
min_cov = 10;
trim = 200;
edge_safe = 100;
tspace = 900;
step = 50;

[consensus]
min_length = 4000;
trim_end = 200;
best_n = 1;
quality_threshold = 0.23;

[layout]
hinge_slack = 1000
min_connected_component_size = 8
del_telomere = 1
aggressive_pruning = 1
"""

CHROMS = (100_000, 90_000, 80_000, 70_000, 60_000)
_OFFS = [sum(CHROMS[:i]) for i in range(len(CHROMS))]
# two guaranteed telomere-spanning long reads per chromosome (the >10kb
# reads filter.cpp:537-561 self.flag looks for)
_EXTRA = tuple(
    [(o, 14_000, 0) for o in _OFFS]
    + [(o + L - 14_000, 14_000, 1) for o, L in zip(_OFFS, CHROMS)]
)
PARAMS = SimParams(
    chromosomes=CHROMS, telomere_len=6_000, telomere_unit=400,
    telomere_cross_cap=900, coverage=20.0, mean_read_len=6_000,
    std_read_len=1_800, seed=1, extra_reads=_EXTRA,
)


@pytest.fixture(scope="module")
def dataset():
    genome, reads, rs, ov = simulate(PARAMS)
    return dict(genome=genome, reads=reads, rs=rs, ov=ov)


def test_reads_stay_within_chromosomes(dataset):
    import dataclasses

    p = dataclasses.replace(PARAMS, genome_len=sum(CHROMS), circular=False)
    offs = chrom_offsets(p)
    for r in dataset["reads"]:
        if r.chimeric:
            continue
        g0, g1 = int(r.gmap.min()), int(r.gmap.max())
        assert any(o <= g0 and g1 < o + L for o, L in offs), (g0, g1)


def test_telomere_homology_emitted(dataset):
    import dataclasses

    ov = dataset["ov"]
    # tandem self-alignments exist (self.flag feedstock)
    assert (ov.a_id == ov.b_id).sum() > 0
    # cross-chromosome telomere matches exist
    p = dataclasses.replace(PARAMS, genome_len=sum(CHROMS), circular=False)
    offs = chrom_offsets(p)

    def chrom_of(g):
        for ci, (o, L) in enumerate(offs):
            if o <= g < o + L:
                return ci

    rchrom = np.array([chrom_of(int(r.gmap[0])) for r in dataset["reads"]])
    assert (rchrom[ov.a_id] != rchrom[ov.b_id]).sum() > 0
    # 2 blocks per chromosome, identical content
    regs = telomere_regions(p)
    assert len(regs) == 2 * len(CHROMS)
    g = dataset["genome"]
    first = g[regs[0][0] : regs[0][0] + regs[0][1]]
    for s, T in regs[1:]:
        np.testing.assert_array_equal(g[s : s + T], first)


@pytest.fixture(scope="module")
def yeast_e2e(dataset, tmp_path_factory):
    from hinge_tpu.io.fasta import write_fasta
    from hinge_tpu.io.las import write_las
    from hinge_tpu.pipeline import assemble

    tmp = tmp_path_factory.mktemp("yeast_mc")
    rs, ov = dataset["rs"], dataset["ov"]
    fasta = str(tmp / "reads.fasta")
    las = str(tmp / "reads.las")
    write_fasta(fasta, ((rs.names[i], rs.get_seq(i)) for i in range(rs.n_reads)))
    write_las(las, ov)
    ini = str(tmp / "yeast.ini")
    open(ini, "w").write(YEAST_DEMO_INI)
    res = assemble(fasta=fasta, las=las, config=ini, workdir=str(tmp),
                   log=lambda *a: None)
    return dict(tmp=tmp, res=res, prefix=str(tmp / "asm"))


def test_yeast_flags_populated(yeast_e2e):
    cov_flag = open(yeast_e2e["prefix"] + ".cov.flag").read().split()
    self_flag = open(yeast_e2e["prefix"] + ".self.flag").read().split()
    assert len(cov_flag) > 0, "telomeric coverage asymmetry not flagged"
    assert len(self_flag) > 0, "tandem self-aligned reads not flagged"


def test_yeast_g3_consumed(yeast_e2e):
    # aggressive_pruning=1 -> G3 written and used by draft-path
    assert os.path.exists(yeast_e2e["prefix"] + "1.G3.graphml")


def test_all_chromosomes_reconstructed(yeast_e2e, dataset):
    """Every chromosome's non-telomeric interior must be covered by the
    assembled contigs (500bp probes on both strands)."""
    comp = str.maketrans("ACGT", "TGCA")

    contigs = [s.upper() for _, s in yeast_e2e["res"]["contigs"]]
    blob = "\n".join(contigs + [s.translate(comp)[::-1] for s in contigs])
    g = dataset["genome"]
    code2b = np.frombuffer(b"ACGT", dtype=np.uint8)
    off = 0
    T = PARAMS.telomere_len
    for L in CHROMS:
        lo, hi = off + T + 1000, off + L - T - 1000
        probes = range(lo, hi - 500, 2000)
        found = 0
        for s in probes:
            probe = code2b[g[s : s + 500]].tobytes().decode()
            found += probe in blob
        frac = found / max(1, len(list(probes)))
        assert frac >= 0.8, f"chromosome at {off} only {frac:.2f} covered"
        off += L
