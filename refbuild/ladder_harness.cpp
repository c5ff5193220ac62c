// Fuzz harness for the ladder-consensus inner loop: runs the REFERENCE's
// DW_banded _align + falcon get_align_tags + get_cns_from_align_tags exactly
// as draft.cpp:600-682 does, so tests can diff hinge_tpu's myers/falcon_vote
// implementations against the real kernels.
//
// Input (text):
//   nladders
//   per ladder:
//     seq_count mx
//     per segment: len then `len` lowercase acgt chars (as one token)
// Output: per ladder, the consensus string (possibly empty -> line "-").

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include "common.h"
}

int main() {
    int nladders;
    if (scanf("%d", &nladders) != 1) return 1;
    for (int L = 0; L < nladders; L++) {
        int seq_count, mx;
        if (scanf("%d %d", &seq_count, &mx) != 2) return 1;
        std::vector<std::string> segs(seq_count);
        for (int j = 0; j < seq_count; j++) {
            int len;
            char buf[1 << 16];
            if (scanf("%d %s", &len, buf) != 2) return 1;
            segs[j] = std::string(buf, len);
        }

        int alen = (int)segs[mx].size();
        align_tags_t **tags_list =
            (align_tags_t **)calloc(seq_count, sizeof(align_tags_t *));
        for (int j = 0; j < seq_count; j++) {
            int blen = (int)segs[j].size();
            char *aseq = (char *)malloc((20 + alen) * sizeof(char));
            char *bseq = (char *)malloc((20 + blen) * sizeof(char));
            strcpy(aseq, segs[mx].c_str());
            strcpy(bseq, segs[j].c_str());

            aln_range *arange = (aln_range *)calloc(1, sizeof(aln_range));
            arange->s1 = 0;
            arange->e1 = (int)strlen(bseq);
            arange->s2 = 0;
            arange->e2 = (int)strlen(aseq);
            arange->score = 5;

            alignment *alng = _align(bseq, blen, aseq, alen, 150, 1);

            char *q_aln_str = (char *)malloc((5 + strlen(alng->q_aln_str)) * sizeof(char));
            char *t_aln_str = (char *)malloc((5 + strlen(alng->t_aln_str)) * sizeof(char));
            strcpy(q_aln_str + 1, alng->q_aln_str);
            strcpy(t_aln_str + 1, alng->t_aln_str);
            q_aln_str[0] = 'T';
            t_aln_str[0] = 'T';
            for (size_t pos = 0; pos < strlen(q_aln_str); pos++)
                q_aln_str[pos] = toupper(q_aln_str[pos]);
            for (size_t pos = 0; pos < strlen(t_aln_str); pos++)
                t_aln_str[pos] = toupper(t_aln_str[pos]);

            tags_list[j] = get_align_tags(q_aln_str, t_aln_str,
                                          strlen(alng->q_aln_str) + 1, arange,
                                          (unsigned int)j, 0);
            free(q_aln_str);
            free(t_aln_str);
            free(aseq);
            free(bseq);
            free(arange);
            free_alignment(alng);
        }

        consensus_data *consensus =
            get_cns_from_align_tags(tags_list, seq_count, alen + 1, 1);
        if (consensus->sequence[0] == '\0')
            printf("-\n");
        else
            printf("%s\n", consensus->sequence);
        free_consensus_data(consensus);
        for (int j = 0; j < seq_count; j++) free_align_tags(tags_list[j]);
        free(tags_list);
    }
    return 0;
}
