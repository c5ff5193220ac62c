#!/bin/bash
# Build the reference HINGE stage binaries out-of-tree for the parity harness.
# Sources stay read-only in /root/reference; only our shim headers (spdlog +
# Boost.Graph subset) live in this repo. Mirrors the reference's own CMake
# recipe (/root/reference/src/CMakeLists.txt: gnu++11 + -fopenmp; lib deps in
# src/*/CMakeLists.txt) without requiring the empty submodules.
set -euo pipefail

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="$HERE/bin"
OBJ="$HERE/obj"
mkdir -p "$OUT" "$OBJ"

# -fno-strict-aliasing: QV.c's Decode (QV.c:546-635) reads the uint64 bit
# window through uint32*/uint16*/uint8* casts — UB that modern gcc -O2
# miscompiles (verified: Uncompress_Next_QVentry mis-decodes its own
# compressor's output without this flag).
CFLAGS="-O2 -fno-strict-aliasing -fopenmp -I$REF/src/include"
# -include cassert: the real boost headers pull in <cassert> transitively;
# draft.cpp uses assert() without including it itself.
CXXFLAGS="-std=gnu++11 -O2 -fopenmp -I$REF/src/include -I$HERE/shim -include cassert -Wno-deprecated-declarations"

cc_obj() { # name source [extra flags...]
    local name=$1 src=$2; shift 2
    if [ ! -f "$OBJ/$name.o" ] || [ "$src" -nt "$OBJ/$name.o" ]; then
        gcc $CFLAGS "$@" -c "$src" -o "$OBJ/$name.o"
    fi
}
cxx_obj() {
    local name=$1 src=$2; shift 2
    if [ ! -f "$OBJ/$name.o" ] || [ "$src" -nt "$OBJ/$name.o" ]; then
        g++ $CXXFLAGS "$@" -c "$src" -o "$OBJ/$name.o"
    fi
}

# C libraries (compiled as C, matching add_library(DB DB.c QV.c) etc.)
cc_obj DB        "$REF/src/lib/DB.c"
cc_obj QV        "$REF/src/lib/QV.c"
cc_obj align     "$REF/src/lib/align.c"
cc_obj paf       "$REF/src/lib/paf.c"
cc_obj ini       "$REF/src/lib/ini.c"
cc_obj falcon    "$REF/src/lib/falcon.c"
cc_obj DW_banded "$REF/src/lib/DW_banded.c"
cc_obj kmer_lookup "$REF/src/lib/kmer_lookup.c"

# C++ libraries
cxx_obj INIReader   "$REF/src/lib/INIReader.cpp"
cxx_obj LAInterface "$REF/src/lib/LAInterface.cpp"

LIBS="$OBJ/LAInterface.o $OBJ/align.o $OBJ/DB.o $OBJ/QV.o $OBJ/paf.o $OBJ/ini.o $OBJ/INIReader.o"
FALCON="$OBJ/falcon.o $OBJ/DW_banded.o $OBJ/kmer_lookup.o"
LDFLAGS="-fopenmp -lz"

link() { # out main.o [extra objs...]
    local out=$1; shift
    g++ "$@" $LDFLAGS -o "$OUT/$out"
}

cxx_obj filter    "$REF/src/filter/filter.cpp"
link Reads_filter "$OBJ/filter.o" $LIBS

cxx_obj maximal        "$REF/src/maximal/maximal.cpp"
link get_maximal_reads "$OBJ/maximal.o" $LIBS

cxx_obj hinging "$REF/src/layout/hinging.cpp"
link hinging    "$OBJ/hinging.o" $LIBS

cxx_obj draft       "$REF/src/consensus/draft.cpp"
link draft_assembly "$OBJ/draft.o" $LIBS $FALCON

cxx_obj consensus "$REF/src/consensus/consensus.cpp"
link consensus    "$OBJ/consensus.o" $LIBS $FALCON

# QV codec harness (compress .quiva with the vendored QV.c for round-trip
# tests of hinge_tpu/io/qv.py)
if [ ! -f "$OUT/qv_harness" ] || [ "$HERE/qv_harness.c" -nt "$OUT/qv_harness" ]; then
    gcc $CFLAGS "$HERE/qv_harness.c" "$OBJ/QV.o" "$OBJ/DB.o" -lm -o "$OUT/qv_harness"
fi
# decompress direction: validate hinge_tpu's Python ENCODER against the
# vendored decompressor
if [ ! -f "$OUT/qv_unharness" ] || [ "$HERE/qv_unharness.c" -nt "$OUT/qv_unharness" ]; then
    gcc $CFLAGS "$HERE/qv_unharness.c" "$OBJ/QV.o" "$OBJ/DB.o" -lm -o "$OUT/qv_unharness"
fi

echo "refbuild: binaries in $OUT"
