"""PacBio `.qvs` quality-stream decoder (DAZZ_DB QV codec, read path).

Re-implements the reference's Huffman(+run-length) decompressor for the five
PacBio quality streams — deletion QV, deletion tag, insertion QV, merge QV,
substitution QV — exactly as vendored in the reference:

* coding header + scheme tables: `Read_QVcoding` / `Read_Scheme`
  (src/lib/QV.c:1177-1269, :359-413)
* per-entry stream decode: `Uncompress_Next_QVentry` (QV.c:1353-1406) with
  `Decode` (:547-637, lazy 32-bit refills), `Decode_Run` (:641-760,
  run-char streams with 16-bit escape), 2-bit tag decompression
  `Uncompress_Read`/`Lower_Read` (src/lib/DB.c:311-342) and the packed-tag
  expansion `Unpack_Tag` (QV.c:868-878).
* DB integration: one coding scheme per imported .quiva file, entries at
  each read's `coff` (DB.c `Open_QVs`:821-1035).

This is a capability/compatibility path (the assembly pipeline itself
consumes only the DASqv-style `qual` *track*, which `ops/intrinsic_qv.py`
can also synthesize from `.las` diffs); it is deliberately host Python —
the per-symbol bit loop is cold and tiny next to the overlap stream.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO, Dict, List, Optional

import numpy as np

_M64 = (1 << 64) - 1
_LETTER = b"acgt"


@dataclasses.dataclass
class HScheme:
    """One Huffman table: code lengths + 16-bit prefix lookup (QV.c:66-77)."""

    type: int
    lens: np.ndarray  # int32 [256]
    lookup: np.ndarray  # int32 [65536]


@dataclasses.dataclass
class QVCoding:
    """Parsed coding block (QV.h:66-77 QVcoding)."""

    flip: bool
    del_char: int  # -1 when the deletion stream is not run-coded
    sub_char: int
    prefix: str
    del_scheme: HScheme
    drun_scheme: Optional[HScheme]
    ins_scheme: HScheme
    mrg_scheme: HScheme
    sub_scheme: HScheme
    srun_scheme: Optional[HScheme]


def _read_scheme(f: BinaryIO, flip: bool) -> HScheme:
    """QV.c Read_Scheme (:359-413): type byte, 256 x (len byte [+ uint32])."""
    t = f.read(1)
    if len(t) != 1:
        raise ValueError("qvs: truncated scheme type byte")
    lens = np.zeros(256, dtype=np.int32)
    bits = np.zeros(256, dtype=np.uint32)
    wfmt = ">I" if flip else "<I"
    for i in range(256):
        x = f.read(1)
        if len(x) != 1:
            raise ValueError(f"qvs: truncated code length {i}")
        lens[i] = x[0]
        if x[0] > 0:
            w = f.read(4)
            if len(w) != 4:
                raise ValueError(f"qvs: truncated code bits {i}")
            bits[i] = struct.unpack(wfmt, w)[0]
    look = np.zeros(65536, dtype=np.int32)
    for i in range(256):
        if lens[i] > 0:
            base = int(bits[i]) << (16 - int(lens[i]))
            powr = 1 << (16 - int(lens[i]))
            look[base : base + powr] = i
    return HScheme(type=t[0], lens=lens, lookup=look)


def read_qvcoding(f: BinaryIO) -> QVCoding:
    """QV.c Read_QVcoding (:1177-1269)."""
    key = struct.unpack("<H", f.read(2))[0]
    flip = key != 0x33CC
    hfmt = ">H" if flip else "<H"
    ifmt = ">i" if flip else "<i"
    del_char = struct.unpack(hfmt, f.read(2))[0]
    if del_char >= 256:
        del_char = -1
    sub_char = struct.unpack(hfmt, f.read(2))[0]
    if sub_char >= 256:
        sub_char = -1
    plen = struct.unpack(ifmt, f.read(4))[0]
    prefix = f.read(plen).decode("latin-1") if plen > 0 else ""
    del_scheme = _read_scheme(f, flip)
    drun = _read_scheme(f, flip) if del_char >= 0 else None
    ins_scheme = _read_scheme(f, flip)
    mrg_scheme = _read_scheme(f, flip)
    sub_scheme = _read_scheme(f, flip)
    srun = _read_scheme(f, flip) if sub_char >= 0 else None
    return QVCoding(
        flip=flip, del_char=del_char, sub_char=sub_char, prefix=prefix,
        del_scheme=del_scheme, drun_scheme=drun, ins_scheme=ins_scheme,
        mrg_scheme=mrg_scheme, sub_scheme=sub_scheme, srun_scheme=srun,
    )


class _BitReader:
    """The Decode loop's 64-bit window with lazy uint32 refills (QV.c GET,
    :575-604).  Each Decode/Decode_Run call gets a FRESH reader — streams
    consume whole uint32 words and trailing bits are discarded."""

    __slots__ = ("f", "flip", "icode", "ilen")

    def __init__(self, f: BinaryIO, flip: bool):
        self.f = f
        self.flip = flip
        self.icode = 0
        self.ilen = 0

    def get(self, n: int) -> None:
        if n > self.ilen:
            w = self.f.read(4)
            if len(w) != 4:
                raise ValueError("qvs: truncated stream (Decode refill)")
            word = struct.unpack(">I" if self.flip else "<I", w)[0]
            # fread(ipart): the new word REPLACES the low 32 bits
            ic = ((self.icode << self.ilen) & _M64) & ~0xFFFFFFFF | word
            k = n - self.ilen
            self.icode = (ic << k) & _M64
            self.ilen = 32 - k
        else:
            self.icode = (self.icode << n) & _M64
            self.ilen -= n

    @property
    def xpart(self) -> int:  # next 16 bits
        return (self.icode >> 32) & 0xFFFF

    @property
    def cpart(self) -> int:  # next 8 bits
        return (self.icode >> 40) & 0xFF


def _decode(scheme: HScheme, f: BinaryIO, rlen: int, flip: bool) -> bytearray:
    """QV.c Decode (:547-637)."""
    signal = 255 if scheme.type == 2 else 256
    lens = scheme.lens
    look = scheme.lookup
    br = _BitReader(f, flip)
    out = bytearray(rlen)
    n = 16
    for j in range(rlen):
        br.get(n)
        c = int(look[br.xpart])
        n = int(lens[c])
        if c == signal:
            br.get(n)
            c = br.cpart
            n = 8
        out[j] = c
    return out


def _decode_run(
    neme: HScheme, reme: HScheme, f: BinaryIO, rlen: int, rchar: int, flip: bool
) -> bytearray:
    """QV.c Decode_Run (:641-760): (run-length, literal) alternation."""
    nsignal = 255 if neme.type == 2 else 256
    br = _BitReader(f, flip)
    out = bytearray(rlen)
    n = 16
    j = 0
    while j < rlen:
        br.get(n)
        c = int(reme.lookup[br.xpart])
        n = int(reme.lens[c])
        if c == 255:
            br.get(n)
            c = br.xpart
            n = 16
        for _ in range(c):
            out[j] = rchar
            j += 1
        if j < rlen:
            br.get(n)
            c = int(neme.lookup[br.xpart])
            n = int(neme.lens[c])
            if c == nsignal:
                br.get(n)
                c = br.cpart
                n = 8
            out[j] = c
        j += 1  # the for-loop increment
    return out


def _unpack_2bit(data: bytes, clen: int) -> bytearray:
    """DB.c Uncompress_Read + Lower_Read (:311-342): 2-bit codes → 'acgt'."""
    out = bytearray(clen)
    for k in range(clen):
        b = data[k >> 2]
        out[k] = _LETTER[(b >> (6 - 2 * (k & 3))) & 3]
    return out


def uncompress_entry(f: BinaryIO, coding: QVCoding, rlen: int) -> Dict[str, bytes]:
    """QV.c Uncompress_Next_QVentry (:1353-1406): the 5 streams of one read."""
    flip = coding.flip
    if coding.del_char < 0:
        del_qv = _decode(coding.del_scheme, f, rlen, flip)
        clen = rlen
    else:
        del_qv = _decode_run(
            coding.del_scheme, coding.drun_scheme, f, rlen, coding.del_char, flip
        )
        clen = sum(1 for q in del_qv if q != coding.del_char)
    tlen = (clen + 3) >> 2
    packed = f.read(tlen) if tlen > 0 else b""
    if len(packed) != tlen:
        raise ValueError("qvs: truncated deletion tag")
    tag = _unpack_2bit(packed, clen)
    if coding.del_char >= 0:
        # Unpack_Tag (QV.c:868-878): expand to rlen, 'n' at del_char slots
        full = bytearray(rlen)
        j = clen - 1
        for k in range(rlen - 1, -1, -1):
            if del_qv[k] == coding.del_char:
                full[k] = ord("n")
            else:
                full[k] = tag[j]
                j -= 1
        tag = full
    ins_qv = _decode(coding.ins_scheme, f, rlen, flip)
    mrg_qv = _decode(coding.mrg_scheme, f, rlen, flip)
    if coding.sub_char < 0:
        sub_qv = _decode(coding.sub_scheme, f, rlen, flip)
    else:
        sub_qv = _decode_run(
            coding.sub_scheme, coding.srun_scheme, f, rlen, coding.sub_char, flip
        )
    return {
        "del_qv": bytes(del_qv),
        "del_tag": bytes(tag),
        "ins_qv": bytes(ins_qv),
        "mrg_qv": bytes(mrg_qv),
        "sub_qv": bytes(sub_qv),
    }


def read_quiva_qvs(path: str, rlens) -> List[Dict[str, bytes]]:
    """Decode a single-file `.qvs` stream: coding block, then one entry per
    read length in `rlens` (the layout our qv harness and a 1-file DB use)."""
    out = []
    with open(path, "rb") as f:
        coding = read_qvcoding(f)
        for rlen in rlens:
            out.append(uncompress_entry(f, coding, int(rlen)))
    return out


def read_db_qvs(db_path: str) -> List[Dict[str, bytes]]:
    """Decode every read's QV streams from a DB's `.qvs` (DB.c Open_QVs
    :821-1035: per imported file, a coding block followed by its reads'
    entries; the first read of each file carries the block offset in coff)."""
    from hinge_tpu.io.dazz_db import _HITS_DB, _HITS_READ, _db_paths

    stub, idx_path, _ = _db_paths(db_path)
    # stub: "files = N" + per-file "lastread prolog fname"
    lastreads = []
    with open(stub) as f:
        nfiles = int(f.readline().split("=")[1])
        for _ in range(nfiles):
            lastreads.append(int(f.readline().split()[0]))
    with open(idx_path, "rb") as f:
        hdr = np.frombuffer(f.read(_HITS_DB.itemsize), dtype=_HITS_DB)[0]
        nreads = int(hdr["ureads"])
        reads = np.frombuffer(f.read(_HITS_READ.itemsize * nreads), dtype=_HITS_READ)
    out = []
    # hidden file alongside .idx/.bps: DB.c opens Catenate(db->path, ".qvs")
    with open(idx_path[: -len(".idx")] + ".qvs", "rb") as f:
        first = 0
        for last in lastreads:
            if last <= first:
                continue
            f.seek(int(reads["coff"][first]))
            coding = read_qvcoding(f)
            for i in range(first, last):
                out.append(uncompress_entry(f, coding, int(reads["rlen"][i])))
            first = last
    return out
