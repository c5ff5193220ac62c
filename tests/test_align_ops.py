import numpy as np
import pytest

from hinge_tpu.data.overlaps import str_to_codes, codes_to_str
from hinge_tpu.ops import falcon_vote as FV
from hinge_tpu.ops import myers as MY


def _codes(s):
    return str_to_codes(s)


def _mutate(rng, codes, sub, ins, dele):
    out = []
    for c in codes:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append((c + rng.integers(1, 4)) % 4)
        else:
            out.append(c)
        if rng.random() < ins:
            out.append(rng.integers(0, 4))
    return np.array(out, dtype=np.uint8)


def test_align_identical():
    q = _codes("ACGTACGTAAACCCGGG")
    a = MY.align_pair(q, q.copy())
    assert a.aligned
    np.testing.assert_array_equal(a.q_aln, q)
    np.testing.assert_array_equal(a.t_aln, q)
    assert a.dist == 0


def test_align_with_errors_roundtrip():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 500).astype(np.uint8)
    q = _mutate(rng, t, 0.05, 0.03, 0.03)
    a = MY.align_pair(q, t, band_tolerance=150)
    assert a.aligned
    # alignment rows reproduce the inputs when gaps are removed
    np.testing.assert_array_equal(a.q_aln[a.q_aln != MY.GAP], q[a.q_s : a.q_e])
    np.testing.assert_array_equal(a.t_aln[a.t_aln != MY.GAP], t[a.t_s : a.t_e])
    # error count is reasonable
    assert a.dist < 120


def test_align_full_consumes_everything():
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 300).astype(np.uint8)
    q = _mutate(rng, t, 0.08, 0.02, 0.02)
    qr, tr = MY.align_full(q, t)
    assert len(qr) == len(tr)
    np.testing.assert_array_equal(qr[qr != MY.GAP], q)
    np.testing.assert_array_equal(tr[tr != MY.GAP], t)


def test_align_empty():
    q = np.zeros(0, np.uint8)
    t = _codes("ACGT")
    qr, tr = MY.align_full(q, t)
    np.testing.assert_array_equal(tr[tr != MY.GAP], t)


def test_align_with_trace_stitches(noisy_sim):
    ov = noisy_sim["overlaps"]
    rs = noisy_sim["read_store"]
    rng = np.random.default_rng(4)
    checked = 0
    for k in rng.permutation(ov.n)[:10]:
        k = int(k)
        a_seq = rs.get_bases(int(ov.a_id[k]))
        b_seq = rs.get_bases(int(ov.b_id[k]))
        from hinge_tpu.data.overlaps import revcomp_codes

        if ov.rc[k]:
            b_frame = revcomp_codes(b_seq)
            bb = int(ov.b_len[k]) - int(ov.b_end[k])
            be = int(ov.b_len[k]) - int(ov.b_start[k])
        else:
            b_frame = b_seq
            bb, be = int(ov.b_start[k]), int(ov.b_end[k])
        ra, rb = MY.align_with_trace(
            a_seq, b_frame, int(ov.a_start[k]), int(ov.a_end[k]), bb, be,
            ov.trace_pairs(k), tspace=ov.tspace,
        )
        assert len(ra) == len(rb)
        np.testing.assert_array_equal(ra[ra != MY.GAP], a_seq[ov.a_start[k] : ov.a_end[k]])
        np.testing.assert_array_equal(rb[rb != MY.GAP], b_frame[bb:be])
        # high identity in aligned columns
        both = (ra != MY.GAP) & (rb != MY.GAP)
        ident = (ra[both] == rb[both]).mean()
        assert ident > 0.9, ident
        checked += 1
    assert checked == 10


def test_falcon_consensus_recovers_template():
    rng = np.random.default_rng(7)
    template = rng.integers(0, 4, 400).astype(np.uint8)
    tags_list = []
    for j in range(12):
        q = _mutate(rng, template, 0.04, 0.02, 0.02)
        a = MY.align_pair(q, template, band_tolerance=150)
        assert a.aligned
        qrow = np.concatenate([[np.uint8(3)], a.q_aln])
        trow = np.concatenate([[np.uint8(3)], a.t_aln])
        tags_list.append(FV.get_align_tags(qrow, trow, j, 0))
    cns, low = FV.get_cns_from_align_tags(tags_list, len(template) + 1, 1)
    # consensus should equal the template (coverage 12, independent errors)
    assert len(cns) >= len(template) - 5
    from difflib import SequenceMatcher

    s1 = codes_to_str(cns)
    s2 = codes_to_str(template)
    sm = SequenceMatcher(None, s1, s2, autojunk=False)
    assert sm.ratio() > 0.98, sm.ratio()


def test_falcon_fast_matches_reference():
    """Vectorized get_cns_from_align_tags vs the scalar transcription."""
    from hinge_tpu.ops.falcon_vote import get_cns_from_align_tags_ref

    rng = np.random.default_rng(11)
    for trial in range(4):
        template = rng.integers(0, 4, 300).astype(np.uint8)
        tags_list = []
        for j in range(8):
            q = _mutate(rng, template, 0.05, 0.02, 0.02)
            a = MY.align_pair(q, template, band_tolerance=150)
            qrow = np.concatenate([[np.uint8(3)], a.q_aln])
            trow = np.concatenate([[np.uint8(3)], a.t_aln])
            tags_list.append(FV.get_align_tags(qrow, trow, j, 0))
        fast, lowf = FV.get_cns_from_align_tags(tags_list, len(template) + 1, 1)
        ref, lowr = get_cns_from_align_tags_ref(tags_list, len(template) + 1, 1)
        np.testing.assert_array_equal(fast, ref)
        np.testing.assert_array_equal(lowf, lowr)


def test_falcon_cns_batch_matches_per_window():
    """Native batched consensus (io_native.cpp:falcon_cns_batch) vs the
    per-window numpy path — byte-identical over realistic aligned windows
    AND adversarial random tag streams (including tp beyond t_len, where
    the covh guard applies)."""
    rng = np.random.default_rng(23)
    wins, tls, mcs = [], [], []
    # realistic windows: mutated reads aligned to a template
    for trial in range(6):
        template = rng.integers(0, 4, int(rng.integers(80, 400))).astype(np.uint8)
        tags_list = []
        for j in range(int(rng.integers(2, 9))):
            q = _mutate(rng, template, 0.05, 0.02, 0.02)
            a = MY.align_pair(q, template, band_tolerance=150)
            qrow = np.concatenate([[np.uint8(3)], a.q_aln])
            trow = np.concatenate([[np.uint8(3)], a.t_aln])
            tags_list.append(FV.get_align_tags(qrow, trow, j, 0))
        wins.append(np.concatenate(tags_list))
        tls.append(len(template) + 1)
        mcs.append(1)
    # adversarial: random rows (no gap-gap columns — those self-link)
    for trial in range(40):
        tlen = int(rng.integers(3, 120))
        tags_list = []
        for s in range(int(rng.integers(1, 6))):
            L = int(rng.integers(1, 3 * tlen))
            qrow = rng.integers(0, 5, L).astype(np.uint8)
            trow = rng.integers(0, 5, L).astype(np.uint8)
            both = (qrow == 4) & (trow == 4)
            qrow[both] = rng.integers(0, 4, int(both.sum())).astype(np.uint8)
            tags_list.append(FV.get_align_tags(qrow, trow, s, 0))
        allt = (np.concatenate([t for t in tags_list if len(t)])
                if any(len(t) for t in tags_list)
                else np.zeros((0, 6), np.int32))
        wins.append(allt)
        tls.append(tlen)
        mcs.append(int(rng.integers(0, 4)))
    # windows the C kernel must REJECT (out_len=-1 -> numpy fallback):
    # t_pos beyond the 21-bit key range, and a p_t_pos beyond it (ADVICE r1)
    big = (1 << 21) + 5
    rej1 = np.array([[big, 0, -1, 0, 5, 2], [big + 1, 0, big, 0, 2, 1]],
                    dtype=np.int32)
    wins.append(rej1)
    tls.append(big + 10)
    mcs.append(1)
    rej2 = np.array([[1, 0, -1, 0, 5, 2], [2, 0, big, 0, 2, 1]],
                    dtype=np.int32)
    wins.append(rej2)
    tls.append(10)
    mcs.append(1)
    batch = FV.get_cns_batch(wins, tls, mcs)
    for i, (seq_b, low_b) in enumerate(batch):
        seq_p, low_p = FV.get_cns_from_align_tags([wins[i]], tls[i], mcs[i])
        np.testing.assert_array_equal(seq_b, seq_p, err_msg=f"window {i}")
        np.testing.assert_array_equal(low_b, low_p, err_msg=f"window {i}")


def test_get_align_tags_vectorized_matches_scalar():
    from hinge_tpu.ops.falcon_vote import _get_align_tags_scalar

    rng = np.random.default_rng(13)
    for trial in range(10):
        t = rng.integers(0, 4, 200).astype(np.uint8)
        q = _mutate(rng, t, 0.08, 0.05, 0.05)
        a = MY.align_pair(q, t, band_tolerance=150)
        qrow = np.concatenate([[np.uint8(3)], a.q_aln])
        trow = np.concatenate([[np.uint8(3)], a.t_aln])
        fast = FV.get_align_tags(qrow, trow, trial, 0)
        ref = _get_align_tags_scalar(qrow, trow, trial, 0)
        np.testing.assert_array_equal(fast, ref)
    # gap-leading rows (j = -1 prefix) must take the scalar fallback path
    qrow = np.array([0, 1, 2], dtype=np.uint8)
    trow = np.array([FV.GAP, FV.GAP, 1], dtype=np.uint8)
    np.testing.assert_array_equal(
        FV.get_align_tags(qrow, trow, 0, 0), _get_align_tags_scalar(qrow, trow, 0, 0)
    )


class TestNativeMyersBatch:
    """Native myers_align_batch must be byte-identical to the Python
    align_full on every window (it is the same recurrence transcribed)."""

    def test_matches_python_on_noisy_windows(self):
        from hinge_tpu.native import get_lib
        if get_lib() is None:
            import pytest
            pytest.skip("native toolchain unavailable")
        from hinge_tpu.ops.myers import align_full, align_full_batch

        rng = np.random.default_rng(5)
        qs, ts = [], []
        for _ in range(60):
            n = int(rng.integers(0, 130))
            q = rng.integers(0, 4, n).astype(np.uint8)
            t = q.copy()
            # random edits
            for _ in range(int(rng.integers(0, 12))):
                if len(t) == 0:
                    break
                p = int(rng.integers(0, len(t)))
                op = rng.integers(0, 3)
                if op == 0:
                    t[p] = (t[p] + 1) % 4
                elif op == 1:
                    t = np.delete(t, p)
                else:
                    t = np.insert(t, p, rng.integers(0, 4))
            qs.append(q)
            ts.append(t.astype(np.uint8))
        # extremes: empty vs non-empty, both empty, fully divergent
        qs += [np.zeros(0, np.uint8), np.zeros(0, np.uint8),
               np.zeros(50, np.uint8)]
        ts += [np.arange(5, dtype=np.uint8) % 4, np.zeros(0, np.uint8),
               np.full(50, 3, np.uint8)]
        batch = align_full_batch(qs, ts)
        for (qr_n, tr_n), q, t in zip(batch, qs, ts):
            qr_p, tr_p = align_full(q, t)
            np.testing.assert_array_equal(qr_n, qr_p)
            np.testing.assert_array_equal(tr_n, tr_p)


def test_falcon_tags_batch_matches_per_row():
    """Native falcon_tags_batch vs per-row get_align_tags (sentinel
    prepended), incl. delta>=255 drop rows that force the scalar path."""
    from hinge_tpu.ops.falcon_vote import get_align_tags, get_align_tags_batch

    rng = np.random.default_rng(6)
    rows_q, rows_t = [], []
    for i in range(60):
        L = int(rng.choice([0, 5, 80, 400, 1200]))
        q = rng.integers(0, 5, L).astype(np.uint8)
        t = rng.integers(0, 5, L).astype(np.uint8)
        if i % 7 == 0 and L > 600:
            t[100:500] = 4  # 400 consecutive template gaps -> delta > 255
        rows_q.append(q)
        rows_t.append(t)
    got = get_align_tags_batch(rows_q, rows_t, sentinel=True)
    for g, q, t in zip(got, rows_q, rows_t):
        qs = np.concatenate([[np.uint8(3)], q])
        ts = np.concatenate([[np.uint8(3)], t])
        ref = get_align_tags(qs, ts, 0, 0)
        np.testing.assert_array_equal(np.asarray(g), ref)
