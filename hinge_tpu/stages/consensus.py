"""Stage 8 — consensus polishing (`hinge consensus`, reference
`src/consensus/consensus.cpp`).

Two-database mode: contigs are the A reads, raw reads the B reads.  Per
contig: keep the best alignment per read above min_length
(remove_multialign, consensus.cpp:62-75), derive full alignment rows, chop
100 columns at each end (chop_end:28-45), then a column-wise plurality vote
over {A,C,G,T,-} plus a single-insertion track (:162-269):

* coverage < 3 -> keep the draft base lowercased,
* insertion emitted when insertion_score > cov/2 (argmax over A,C,G,T),
* deletion when '-' wins the column.

The vote accumulations are scatter-adds over (position, base) — numpy here,
with the same layout a TPU one-hot scatter kernel uses.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from hinge_tpu.config import Config
from hinge_tpu.data.overlaps import OverlapStore, ReadStore, revcomp_codes
from hinge_tpu.ops import batch_align as BA
from hinge_tpu.ops import dalign_trace as DT
from hinge_tpu.ops import myers as MY
from hinge_tpu.stages.draft import codes_to_text

GAP = MY.GAP


def chop_end(row_a: np.ndarray, row_b: np.ndarray, chop: int):
    """consensus.cpp:28-45. Returns (row_a, row_b, offset)."""
    n = len(row_a)
    if n < chop * 2 + 10:
        return row_a, row_b, 0
    start = chop
    while start < n and row_a[start] == GAP:
        start += 1
    offset = int((row_a[:start] != GAP).sum())
    return row_a[start : n - chop], row_b[start : n - chop], offset


def remove_multialign(rows: np.ndarray, ov: OverlapStore, min_len: int) -> List[int]:
    """Best alignment per B read with span >= min_len (consensus.cpp:62-75);
    rows must already be sorted by descending summed match length."""
    out: List[int] = []
    seen = set()
    for r in rows:
        r = int(r)
        if int(ov.a_end[r] - ov.a_start[r]) >= min_len:
            b = int(ov.b_id[r])
            if b not in seen:
                seen.add(b)
                out.append(r)
    return out


def run_consensus(
    contigs: List[Tuple[str, str]],  # (name, draft sequence text)
    rs: ReadStore,  # raw reads
    aln: OverlapStore,  # contig-vs-read records (A=contig, B=read)
    cfg: Config,
    out_fasta: Optional[str] = None,
    band: int = 300,
) -> List[Tuple[str, str]]:
    min_len = cfg.consensus.min_length
    n_contigs = len(contigs)
    from hinge_tpu.data.overlaps import str_to_codes

    draft_codes = [str_to_codes(seq) for _, seq in contigs]

    # per-contig alignment lists sorted by compare_overlap_aln (desc sum)
    order = np.lexsort((np.arange(aln.n), -(aln.match_len()), aln.a_id))
    bounds = np.searchsorted(aln.a_id[order], np.arange(n_contigs + 1))

    results: List[Tuple[str, str]] = []
    for ci in range(n_contigs):
        tmpl = draft_codes[ci]
        alen = len(tmpl)
        rows = order[bounds[ci] : bounds[ci + 1]]
        sel = remove_multialign(rows, aln, min_len)
        if not sel:
            results.append((f"Consensus{ci}", contigs[ci][1]))
            continue

        # all alignment rows for this contig in pooled window batches
        items = []
        traced = []
        for r in sel:
            it = _row_item(aln, r, tmpl, rs)
            if it is not None:
                items.append(it)
                traced.append(r)
        # exact recoverAlignment+getAlignmentTags rows (ops/dalign_trace.py)
        bulk = DT.align_overlap_rows_exact(items)
        rows_by_r = dict(zip(traced, bulk))

        # pooled column vote: gather every read's (pos, base) pairs, then
        # ONE bincount per tally (np.add.at per read was the profile's top
        # host cost at the 10^5-read scale)
        pm_l, bm_l, pi_l, bi_l = [], [], [], []
        for r in sel:
            if r in rows_by_r:
                rowA, rowB = rows_by_r[r]
            else:
                rowA, rowB = _contig_read_rows(aln, r, tmpl, rs, band)
            rowA, rowB, offset = chop_end(rowA, rowB, 100)
            pos0 = int(aln.a_start[r]) + offset
            a_nogap = rowA != GAP
            pos = pos0 + np.cumsum(a_nogap) - a_nogap  # position per column
            valid = pos < alen
            m_match = a_nogap & valid
            pm_l.append(pos[m_match])
            bm_l.append(rowB[m_match])
            m_ins = (~a_nogap) & (rowB != GAP) & valid
            pi_l.append(pos[m_ins])
            bi_l.append(rowB[m_ins])
        pm = np.concatenate(pm_l) if pm_l else np.zeros(0, np.int64)
        bm = np.concatenate(bm_l) if bm_l else np.zeros(0, np.uint8)
        pi = np.concatenate(pi_l) if pi_l else np.zeros(0, np.int64)
        bi = np.concatenate(bi_l) if bi_l else np.zeros(0, np.uint8)
        scores = np.bincount(
            pm.astype(np.int64) * 5 + bm, minlength=alen * 5
        ).reshape(alen, 5).astype(np.int32)
        cov = np.bincount(pm, minlength=alen).astype(np.int32)[:alen]
        ins_score = np.bincount(pi, minlength=alen).astype(np.int32)[:alen]
        ins_scores = np.bincount(
            pi.astype(np.int64) * 5 + bi, minlength=alen * 5
        ).reshape(alen, 5).astype(np.int32)

        # emission (consensus.cpp:231-269), vectorized: each draft position
        # emits 0-2 bytes (optional insertion + base-or-deletion); build the
        # two per-position byte columns and compact the used ones
        lowmask = cov < 3
        max_base = np.argmax(scores, axis=1)  # first max wins, like the loop
        ins_emit = (ins_score > cov // 2) & ~lowmask
        max_ins = np.argmax(ins_scores[:, :4], axis=1)
        draft_text = contigs[ci][1]
        draft_bytes = np.frombuffer(draft_text.encode(), dtype=np.uint8)[:alen]
        upper = np.frombuffer(b"ACGT", dtype=np.uint8)
        to_lower = draft_bytes | 0x20  # ASCII lowercase
        col0 = np.where(ins_emit, upper[max_ins], 0).astype(np.uint8)
        base_byte = np.where(
            lowmask, to_lower,
            np.where(max_base < 4, upper[np.minimum(max_base, 3)], 0),
        ).astype(np.uint8)
        interleaved = np.empty(2 * alen, dtype=np.uint8)
        interleaved[0::2] = col0
        interleaved[1::2] = base_byte
        out_bytes = interleaved[interleaved != 0]
        results.append((f"Consensus{ci}", out_bytes.tobytes().decode()))

    if out_fasta is not None:
        with open(out_fasta, "w") as f:
            for name, seq in results:
                f.write(f">{name}\n{seq}\n")
    return results


def _row_item(aln: OverlapStore, r: int, tmpl: np.ndarray, rs: ReadStore):
    """Bulk-batch item for record r, or None when there are no trace points
    (falls back to the scalar full-region path)."""
    if aln.tlen[r] <= 0:
        return None
    read = rs.get_bases(int(aln.b_id[r]))
    rc = int(aln.rc[r])
    blen = int(aln.b_len[r])
    if rc:
        b_frame = revcomp_codes(read)
        bb = blen - int(aln.b_end[r])
        be = blen - int(aln.b_start[r])
    else:
        b_frame = read
        bb, be = int(aln.b_start[r]), int(aln.b_end[r])
    return (tmpl, b_frame, int(aln.a_start[r]), int(aln.a_end[r]), bb, be,
            aln.trace_pairs(r), aln.tspace)


def _contig_read_rows(aln: OverlapStore, r: int, tmpl: np.ndarray, rs: ReadStore, band: int):
    """Alignment rows contig-vs-read for record r (A row = contig)."""
    read = rs.get_bases(int(aln.b_id[r]))
    rc = int(aln.rc[r])
    blen = int(aln.b_len[r])
    if rc:
        b_frame = revcomp_codes(read)
        bb = blen - int(aln.b_end[r])
        be = blen - int(aln.b_start[r])
    else:
        b_frame = read
        bb, be = int(aln.b_start[r]), int(aln.b_end[r])
    if aln.tlen[r] > 0:
        return BA.align_with_trace_batch(
            tmpl, b_frame, int(aln.a_start[r]), int(aln.a_end[r]), bb, be,
            aln.trace_pairs(r), tspace=aln.tspace,
        )
    return MY.align_full(
        tmpl[int(aln.a_start[r]) : int(aln.a_end[r])], b_frame[bb:be], band
    )
