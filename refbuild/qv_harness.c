/* QV codec harness: compress a .quiva file with the REFERENCE's vendored
 * QV.c (QVcoding_Scan + Create_QVcoding + Write_QVcoding +
 * Compress_Next_QVentry) so tests can round-trip hinge_tpu's Python
 * decoder (hinge_tpu/io/qv.py) against the real compressor.
 *
 * Usage: qv_harness <in.quiva> <lossy 0|1> <out.qvs>
 * Output layout = one coding block then one compressed entry per read
 * (exactly a single-file DB's .qvs payload).
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "DB.h"
#include "QV.h"

extern char *Prog_Name; /* defined in DB.c */

int main(int argc, char **argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s <in.quiva> <lossy 0|1> <out.qvs>\n", argv[0]);
        return 2;
    }
    Prog_Name = argv[0];
    FILE *in = fopen(argv[1], "r");
    int lossy = atoi(argv[2]);
    FILE *out = fopen(argv[3], "wb");
    if (in == NULL || out == NULL) {
        fprintf(stderr, "cannot open files\n");
        return 2;
    }
    if (QVcoding_Scan(in)) return 1;
    QVcoding *coding = Create_QVcoding(lossy);
    if (coding == NULL) return 1;
    coding->prefix = strdup("@fake"); /* set by the caller in dextract */
    Write_QVcoding(out, coding);

    rewind(in);
    while (1) {
        int rlen = Read_Lines(in, 1); /* header line */
        if (rlen < 0) break;
        if (Compress_Next_QVentry(in, out, coding, lossy)) return 1;
    }
    fclose(out);
    fclose(in);
    return 0;
}
