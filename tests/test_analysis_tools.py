"""Tests for the analysis-script equivalents: create_hgraph, connected_trim,
find_exact_repeats / repeat_annotate_reads (reference scripts/
create_hgraph[_nogt].py, connected.py, repeat_annotate_reads.py)."""

import networkx as nx
import numpy as np
import pytest

from hinge_tpu.graph.analysis import connected_trim, create_hgraph
from hinge_tpu.utils.smalltools import find_exact_repeats, repeat_annotate_reads


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


class TestCreateHgraph:
    def test_nodes_edges_active(self, tmp_path):
        p = tmp_path / "x.hgraph"
        p.write_text("3 7 1200 450 1 0\n7 9 450 880 0 1\n")
        g, n_weak, n_strong = create_hgraph(str(p), out_graphml=str(tmp_path / "o.graphml"))
        assert set(g.nodes()) == {"3_1200", "7_450", "9_880"}
        assert list(g.edges()) == [("3_1200", "7_450"), ("7_450", "9_880")]
        # source always active=1; target takes the line's flag — but a later
        # line can overwrite (7_450 is target(active=1) then source(active=1))
        assert g.nodes["3_1200"]["active"] == 1
        assert g.nodes["7_450"]["active"] == 1
        assert g.nodes["9_880"]["active"] == 0
        assert n_weak == 1 and n_strong == 3
        g2 = nx.read_graphml(str(tmp_path / "o.graphml"))
        assert set(g2.nodes()) == set(g.nodes())

    def test_gt_annotation(self, tmp_path):
        p = tmp_path / "x.hgraph"
        p.write_text("3 7 1200 450 1 0\n")
        gt = {"3": [[5000, 1000, 0]]}  # reversed span -> min/max normalized
        g, _, _ = create_hgraph(str(p), gt=gt, out_graphml=str(tmp_path / "o.graphml"))
        assert g.nodes["3_1200"]["aln_start"] == 1000
        assert g.nodes["3_1200"]["aln_end"] == 5000
        assert g.nodes["7_450"]["aln_start"] == 0  # unmapped -> 0/0
        assert g.nodes["7_450"]["aln_end"] == 0


class TestConnectedTrim:
    def test_trims_indegree0_cascade(self, tmp_path):
        # a->b->c->d plus cycle e->f->e: the chain erodes one node per visit
        # sweep, the cycle survives
        p = tmp_path / "edges.txt"
        p.write_text("a->b\nb->c\nc->d\ne->f\nf->e\n")
        g = connected_trim(str(p), str(tmp_path / "dfs.txt"),
                           out_graphml=str(tmp_path / "g.graphml"))
        assert set(g.nodes()) == {"e", "f"}
        dfs = (tmp_path / "dfs.txt").read_text().split()
        assert set(dfs) == {"e", "f"}

    def test_snapshot_iteration_single_round(self, tmp_path):
        # within ONE round, removing 'a' exposes 'b' later in the same
        # nodes() snapshot (insertion order), so a->b->c fully erodes in a
        # single pass when visited in chain order
        p = tmp_path / "edges.txt"
        p.write_text("a->b\nb->c\n")
        g = connected_trim(str(p), str(tmp_path / "dfs.txt"), n_iter=1)
        assert g.number_of_nodes() == 0


class TestFindExactRepeats:
    def test_forward_repeat_within_chrom(self):
        rng = np.random.default_rng(0)
        rep = _rand_seq(rng, 150)
        left = _rand_seq(rng, 200)
        mid = _rand_seq(rng, 180)
        right = _rand_seq(rng, 160)
        genome = left + rep + mid + rep + right
        ivs = find_exact_repeats({0: genome}, min_len=100)[0]
        # both copies found, each interval covering exactly the 150bp repeat
        assert ivs == [(200, 350), (200 + 150 + 180, 200 + 150 + 180 + 150)]

    def test_revcomp_repeat_across_chroms(self):
        rng = np.random.default_rng(1)
        rep = _rand_seq(rng, 120)
        c0 = _rand_seq(rng, 90) + rep + _rand_seq(rng, 90)
        c1 = _rand_seq(rng, 70) + _revcomp(rep) + _rand_seq(rng, 110)
        out = find_exact_repeats({0: c0, 1: c1}, min_len=100)
        assert out[0] == [(90, 210)]
        assert out[1] == [(70, 190)]

    def test_no_repeat(self):
        rng = np.random.default_rng(2)
        out = find_exact_repeats({0: _rand_seq(rng, 500)}, min_len=100)
        assert out[0] == []

    def test_short_duplicate_below_min_len_ignored(self):
        rng = np.random.default_rng(3)
        rep = _rand_seq(rng, 80)  # < min_len
        genome = _rand_seq(rng, 120) + rep + _rand_seq(rng, 120) + rep
        assert find_exact_repeats({0: genome}, min_len=100)[0] == []


class TestRepeatAnnotateReads:
    def test_rows_flagged(self, tmp_path):
        rng = np.random.default_rng(4)
        rep = _rand_seq(rng, 150)
        genome = _rand_seq(rng, 300) + rep + _rand_seq(rng, 250) + rep + _rand_seq(rng, 200)
        fa = tmp_path / "g.fasta"
        fa.write_text(f">1 chr\n{genome}\n")
        gt = tmp_path / "gt.txt"
        # read 0 starts inside the first repeat copy; read 1 far away
        gt.write_text("0 0 320 900\n1 0 10 120\n")
        out = tmp_path / "gt.annot.txt"
        n = repeat_annotate_reads(str(fa), str(gt), str(out), min_len=100,
                                  repeats_out=str(tmp_path / "reps.txt"))
        assert n == 2
        rows = out.read_text().splitlines()
        assert rows[0].split("\t")[-1] == "1"
        assert rows[1].split("\t")[-1] == "0"
        reps = (tmp_path / "reps.txt").read_text().splitlines()
        assert len(reps) == 2 and all(r.split()[0] == "0" for r in reps)
