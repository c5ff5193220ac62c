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
