"""BAI (BAM index) reader, writer, and region→chunk queries.

The reference opens its input through rust-htslib's ``bam::IndexedReader``
(longcallR/src/util.rs:560-613, main.rs:414-427), which requires a ``.bai``
and fetches only the BGZF blocks covering each region. This module is the
htslib-index stand-in: it parses/writes the BAI format (SAM spec §5.2 —
5-level R-tree binning, 16 kb linear index, virtual-offset chunks) and maps
a region to the compressed byte span holding its records, so whole-genome
BAMs never need to be fully resident (``BamFile(path, region=...)``).

A writer is included because this environment has no samtools/pysam: it
indexes coordinate-sorted BAMs we emit (e.g. the phased BAM) and builds
test fixtures.
"""

from __future__ import annotations

import os
import struct
from typing import BinaryIO, Dict, List, Optional, Tuple

import numpy as np

BAI_MAGIC = b"BAI\x01"
_LINEAR_SHIFT = 14          # 16 kb linear-index windows
_BIN_LEVELS = ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681))


def reg2bin(beg: int, end: int) -> int:
    """Smallest bin fully containing [beg, end) (SAM spec §5.3)."""
    end -= 1
    for shift, off in reversed(_BIN_LEVELS):
        if beg >> shift == end >> shift:
            return off + (beg >> shift)
    return 0


def reg2bins(beg: int, end: int) -> List[int]:
    """All bins that may hold records overlapping [beg, end)."""
    end -= 1
    out = [0]
    for shift, off in _BIN_LEVELS:
        out.extend(range(off + (beg >> shift), off + (end >> shift) + 1))
    return out


class BaiIndex:
    """Parsed .bai: per-reference bin→chunks maps plus the linear index."""

    def __init__(self, bins: List[Dict[int, np.ndarray]],
                 intervals: List[np.ndarray]):
        self.bins = bins              # per ref: {bin: [n_chunk, 2] u64 voffs}
        self.intervals = intervals    # per ref: [n_intv] u64 ioffsets

    @classmethod
    def load(cls, path: str) -> "BaiIndex":
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] != BAI_MAGIC:
            raise ValueError(f"{path}: not a BAI index")
        p = 4
        (n_ref,) = struct.unpack_from("<i", data, p)
        p += 4
        bins: List[Dict[int, np.ndarray]] = []
        intervals: List[np.ndarray] = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, p)
            p += 4
            bm: Dict[int, np.ndarray] = {}
            for _ in range(n_bin):
                b, n_chunk = struct.unpack_from("<Ii", data, p)
                p += 8
                chunks = np.frombuffer(data, "<u8", n_chunk * 2, p)
                p += 16 * n_chunk
                bm[int(b)] = chunks.reshape(-1, 2)
            (n_intv,) = struct.unpack_from("<i", data, p)
            p += 4
            ioff = np.frombuffer(data, "<u8", n_intv, p)
            p += 8 * n_intv
            bins.append(bm)
            intervals.append(ioff)
        return cls(bins, intervals)

    def chunk_span(self, ref_id: int, beg: int, end: int
                   ) -> Optional[Tuple[int, int]]:
        """Merged (voff_begin, voff_end) of all chunks that may contain
        records overlapping [beg, end) on ``ref_id``; None when no records.

        One contiguous compressed span (not a chunk list): alignment data of
        a region is nearly contiguous in a coordinate-sorted BAM, so the
        merged span reads at most a few stray blocks more while keeping the
        downstream block-decompression a single bulk operation."""
        if ref_id < 0 or ref_id >= len(self.bins):
            return None
        bm = self.bins[ref_id]
        ivs = self.intervals[ref_id]
        w = beg >> _LINEAR_SHIFT
        min_voff = int(ivs[min(w, len(ivs) - 1)]) if len(ivs) else 0
        lo, hi = None, None
        # pseudo-bin 37450 (htslib metadata) must be skipped if present
        for b in reg2bins(beg, end):
            for cbeg, cend in bm.get(b, ()):
                if int(cend) <= min_voff:
                    continue
                lo = int(cbeg) if lo is None else min(lo, int(cbeg))
                hi = int(cend) if hi is None else max(hi, int(cend))
        if lo is None:
            return None
        return max(lo, min_voff), hi


def bgzf_block_table(raw: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """(coffsets, ustarts) for every BGZF block of an in-memory BAM image:
    header-only scan (BSIZE + ISIZE fields), no decompression."""
    from .bgzf import _block_size_at

    coffs: List[int] = []
    ustarts: List[int] = []
    off, total = 0, 0
    n = len(raw)
    while off < n:
        bsize = _block_size_at(raw, off)
        (isize,) = struct.unpack_from("<I", raw, off + bsize - 4)
        coffs.append(off)
        ustarts.append(total)
        total += isize
        off += bsize
    return (np.asarray(coffs, np.int64), np.asarray(ustarts, np.int64))


def _voff_of(u: int, coffs: np.ndarray, ustarts: np.ndarray) -> int:
    j = int(np.searchsorted(ustarts, u, side="right")) - 1
    return (int(coffs[j]) << 16) | (u - int(ustarts[j]))


def build_bai(bam_path: str, out_path: Optional[str] = None) -> str:
    """Index a coordinate-sorted BAM; returns the .bai path written.

    Mirrors ``samtools index`` output minus the optional metadata pseudo-bin:
    per-bin chunks merged over file-adjacent records, linear-index windows
    backfilled with the preceding offset (SAM spec §5.2)."""
    from .bam import BamFile

    out_path = out_path or bam_path + ".bai"
    with open(bam_path, "rb") as f:
        raw = f.read()
    coffs, ustarts = bgzf_block_table(raw)
    bam = BamFile(bam_path)
    n_ref = len(bam.references)

    order = bam.pos[bam.ref_id >= 0]
    rids = bam.ref_id[bam.ref_id >= 0]
    for t in range(n_ref):
        sel = order[rids == t]
        if np.any(np.diff(sel) < 0):
            raise ValueError(f"{bam_path}: not coordinate-sorted; cannot index")

    buf = bytearray()
    buf += BAI_MAGIC + struct.pack("<i", n_ref)
    for t in range(n_ref):
        idx = np.flatnonzero(bam.ref_id == t)
        bin_chunks: Dict[int, List[List[int]]] = {}
        n_intv = 0
        if idx.size:
            ends = np.maximum(bam.ref_end[idx], bam.pos[idx] + 1)
            n_intv = int((ends.max() - 1) >> _LINEAR_SHIFT) + 1
        ioff = np.zeros(n_intv, np.uint64)
        filled = np.zeros(n_intv, bool)
        for i in idx:
            beg = int(bam.pos[i])
            end = max(int(bam.ref_end[i]), beg + 1)
            # record start includes its 4-byte block_size prefix
            v0 = _voff_of(int(bam.rec_off[i]) - 4, coffs, ustarts)
            v1 = _voff_of(int(bam.rec_end[i]), coffs, ustarts)
            b = reg2bin(beg, end)
            ch = bin_chunks.setdefault(b, [])
            if ch and ch[-1][1] == v0:       # file-adjacent → merge
                ch[-1][1] = v1
            else:
                ch.append([v0, v1])
            w0, w1 = beg >> _LINEAR_SHIFT, (end - 1) >> _LINEAR_SHIFT
            for w in range(w0, w1 + 1):
                if not filled[w] or np.uint64(v0) < ioff[w]:
                    ioff[w] = v0
                    filled[w] = True
        prev = np.uint64(0)
        for w in range(n_intv):              # backfill empty windows
            if not filled[w]:
                ioff[w] = prev
            prev = ioff[w]
        buf += struct.pack("<i", len(bin_chunks))
        for b in sorted(bin_chunks):
            ch = bin_chunks[b]
            buf += struct.pack("<Ii", b, len(ch))
            for v0, v1 in ch:
                buf += struct.pack("<QQ", v0, v1)
        buf += struct.pack("<i", n_intv)
        buf += np.ascontiguousarray(ioff).tobytes()
    with open(out_path, "wb") as f:
        f.write(bytes(buf))
    return out_path
