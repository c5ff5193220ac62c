// Fuzz harness: run the REFERENCE's LAInterface::computeTracePTS on cases
// supplied via stdin and print the recovered trace, so tests can diff it
// against hinge_tpu's exact re-implementation (ops/dalign_trace.py /
// native/dalign_np.cpp).
//
// Input (text):
//   ncases
//   per case:
//     abpos aepos bbpos bepos tspace tlen
//     tlen uint16 trace values
//     actx_len actx_off   (actx bytes cover positions [actx_off, actx_off+len);
//                          byte 0 is the 4-sentinel at position actx_off)
//     actx bytes as space-separated ints
//     bctx_len bctx_off
//     bctx bytes
// Output: per case, one line: tlen then the int trace values.
//
// Buffers mimic recoverAlignment's Load_Subread layout: bytes below the
// leading sentinel are filled with 0xAA so out-of-buffer reads never match
// (hinge_tpu's kernel treats them as mismatches too).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "LAInterface.h"

int main() {
    int ncases;
    if (scanf("%d", &ncases) != 1) return 1;
    LAInterface la;
    Work_Data *work = New_Work_Data();

    for (int t = 0; t < ncases; t++) {
        Overlap ovl;
        Alignment aln;
        aln.path = &ovl.path;
        Path *path = &ovl.path;
        int tspace, tlen;
        if (scanf("%d %d %d %d %d %d", &path->abpos, &path->aepos,
                  &path->bbpos, &path->bepos, &tspace, &tlen) != 6)
            return 1;
        std::vector<uint16_t> trace(tlen);
        for (int i = 0; i < tlen; i++) {
            int v;
            if (scanf("%d", &v) != 1) return 1;
            trace[i] = (uint16_t)v;
        }
        path->tlen = tlen;
        path->trace = trace.data();
        path->diffs = 0;

        int actx_len, actx_off, bctx_len, bctx_off;
        if (scanf("%d %d", &actx_len, &actx_off) != 2) return 1;
        std::vector<char> abuf(actx_len + 128);
        memset(abuf.data(), 0xAA, abuf.size());
        for (int i = 0; i < actx_len; i++) {
            int v;
            if (scanf("%d", &v) != 1) return 1;
            abuf[64 + i] = (char)v;
        }
        if (scanf("%d %d", &bctx_len, &bctx_off) != 2) return 1;
        std::vector<char> bbuf(bctx_len + 128);
        memset(bbuf.data(), 0xAA, bbuf.size());
        for (int i = 0; i < bctx_len; i++) {
            int v;
            if (scanf("%d", &v) != 1) return 1;
            bbuf[64 + i] = (char)v;
        }
        // ctx byte 0 is the sentinel at position actx_off, so position p
        // lives at ctx index p - actx_off + 1.
        aln.aseq = abuf.data() + 64 + 1 - (actx_off + 1);
        aln.bseq = bbuf.data() + 64 + 1 - (bctx_off + 1);
        aln.alen = path->aepos + 1;
        aln.blen = path->bepos + 1;
        aln.flags = 0;

        if (la.computeTracePTS(&aln, work, tspace) != 0) {
            printf("-1\n");
            continue;
        }
        int *out = (int *)path->trace;
        printf("%d", path->tlen);
        for (int i = 0; i < path->tlen; i++) printf(" %d", out[i]);
        printf("\n");
    }
    return 0;
}
