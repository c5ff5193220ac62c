// Sequential host sweeps that are order-dependent by construction and so
// cannot be expressed as device tensor ops.  Each replicates a reference
// scalar loop exactly; the Python callers keep a numpy fallback.
//
// containment_sweep: the maximal-stage contained-read removal
// (reference: src/maximal/maximal.cpp:787-800 — reads processed in
// ascending id order; a read is contained when any of its BCOVERA top
// matches points at a STILL-ACTIVE containing read, where earlier reads may
// already have been deactivated by their own containment).
#include <cstdint>

// consensus_vote_batch: the consensus column-vote accumulation
// (reference: src/consensus/consensus.cpp:162-230 walk + chop_end :28-45).
// One scalar pass per alignment row over its columns; votes land directly
// in the caller's int64 tables.  Semantically identical to the vectorized
// numpy `_vote_tallies` (stages/consensus.py) which remains the oracle the
// suite pins; this path exists because the numpy version's cumsum chain
// costs ~16s at the 4.6Mb scale vs <1s here.
extern "C" int64_t consensus_vote_batch(
    const uint8_t* flat_a,    // alignment A rows, concatenated (GAP == 4)
    const uint8_t* flat_b,    // alignment B rows, same layout
    const int64_t* seg_off,   // [n_segs+1] row offsets into flat_a/flat_b
    const int64_t* pos0,      // [n_segs] contig start per row
    int64_t n_segs,
    int64_t alen,
    int32_t chop,
    int64_t* scores,          // [alen*5]
    int64_t* cov,             // [alen]
    int64_t* ins_score,       // [alen]
    int64_t* ins_scores)      // [alen*5]
{
    const uint8_t GAP = 4;
    for (int64_t s = 0; s < n_segs; ++s) {
        const int64_t o = seg_off[s];
        const int64_t n = seg_off[s + 1] - o;
        const uint8_t* a = flat_a + o;
        const uint8_t* b = flat_b + o;
        int64_t start = 0, end = n, offset = 0;
        if (n >= 2 * (int64_t)chop + 10) {
            start = chop;
            while (start < n && a[start] == GAP) ++start;
            for (int64_t k = 0; k < start; ++k) offset += (a[k] != GAP);
            end = n - chop;
        }
        int64_t pos = pos0[s] + offset;
        for (int64_t k = start; k < end; ++k) {
            const uint8_t ab = a[k];
            if (ab != GAP) {
                if (pos < alen) {
                    scores[pos * 5 + b[k]]++;
                    cov[pos]++;
                }
                ++pos;
            } else if (b[k] != GAP && pos < alen) {
                ins_score[pos]++;
                ins_scores[pos * 5 + b[k]]++;
            }
        }
    }
    return 0;
}

extern "C" int64_t containment_sweep(
    const int32_t* a_ids,        // candidate rows, sorted ascending by a_id
    const int32_t* b_ids,        // (stable within a group = emission order)
    const uint8_t* is_bcovera,   // match_type == BCOVERA per row
    int64_t n,
    uint8_t* active,             // [n_reads] in-out; updated in place
    int32_t* out_pairs)          // [2*max_pairs] (read, containing) pairs
{
    int64_t n_out = 0;
    int32_t last_i = -1;
    bool contained_flag = false;
    int32_t containing = -1;
    for (int64_t q = 0; q < n; ++q) {
        int32_t i = a_ids[q];
        if (i != last_i) {
            if (last_i >= 0 && contained_flag && active[last_i]) {
                active[last_i] = 0;
                out_pairs[2 * n_out] = last_i;
                out_pairs[2 * n_out + 1] = containing;
                ++n_out;
            }
            last_i = i;
            contained_flag = false;
            containing = -1;
        }
        if (!active[i]) continue;
        if (is_bcovera[q]) {
            // the reference records the containing read regardless of its
            // activity; only the contained FLAG requires an active B
            containing = b_ids[q];
            if (active[containing]) contained_flag = true;
        }
    }
    if (last_i >= 0 && contained_flag && active[last_i]) {
        active[last_i] = 0;
        out_pairs[2 * n_out] = last_i;
        out_pairs[2 * n_out + 1] = containing;
        ++n_out;
    }
    return n_out;
}
