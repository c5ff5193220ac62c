/* QV codec harness, decompress direction: decode a .qvs produced by ANY
 * compressor with the REFERENCE's vendored QV.c (Read_QVcoding +
 * Uncompress_Next_QVentry) so tests can validate hinge_tpu's Python
 * ENCODER (hinge_tpu/io/qv.py write path) against the real decompressor.
 *
 * Usage: qv_unharness <in.qvs> <lens.txt> <out.txt>
 *   lens.txt: one read length per line.
 *   out.txt:  5 lines per read (del qv, del tag, ins qv, mrg qv, sub qv).
 */

#include <stdio.h>
#include <stdlib.h>

#include "DB.h"
#include "QV.h"

extern char *Prog_Name;

int main(int argc, char **argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s <in.qvs> <lens.txt> <out.txt>\n", argv[0]);
        return 2;
    }
    Prog_Name = argv[0];
    FILE *in = fopen(argv[1], "rb");
    FILE *lens = fopen(argv[2], "r");
    FILE *out = fopen(argv[3], "w");
    if (in == NULL || lens == NULL || out == NULL) {
        fprintf(stderr, "cannot open files\n");
        return 2;
    }
    QVcoding *coding = Read_QVcoding(in);
    if (coding == NULL) return 1;

    int rlen;
    char *entry[5];
    while (fscanf(lens, "%d", &rlen) == 1) {
        int i;
        for (i = 0; i < 5; i++) {
            entry[i] = (char *)malloc((size_t)rlen + 1);
            if (entry[i] == NULL) return 1;
        }
        if (Uncompress_Next_QVentry(in, entry, coding, rlen)) return 1;
        for (i = 0; i < 5; i++) {
            fwrite(entry[i], 1, (size_t)rlen, out);
            fputc('\n', out);
            free(entry[i]);
        }
    }
    fclose(out);
    fclose(in);
    fclose(lens);
    return 0;
}
