"""Region discovery: depth-scan "isolated regions" over each contig.

Faithful re-implementation of the reference depth scanner
(``longcallR/src/util.rs:236-332`` find_isolated_regions_with_depth and
``util.rs:558-602`` extract_isolated_regions_parallel) with vectorised numpy
depth accumulation instead of a per-base Rust loop. Regions are the unit of
data parallelism in the TPU pipeline — each becomes an independent work item
sharded across hosts/chips.

Exact semantics replicated (needed for output parity):
  * region bounds are (run_start+1, run_end+2): 1-based inclusive start,
    exclusive end (util.rs:300-305);
  * single-column depth runs are NOT emitted (``region_end > region_start``);
  * ``max_coverage`` is a running maximum that resets only when a region is
    emitted, so skipped single-column runs and truncation-break columns fold
    their depth into the next emitted region (util.rs:290-318).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import CallerConfig
from ..io.bam import BamFile, FLAG_SECONDARY, FLAG_SUPPLEMENTARY, FLAG_UNMAPPED


@dataclass
class Region:
    """Genomic work unit. start is 1-based inclusive; end 1-based exclusive
    (mirrors reference ``util.rs:21-69``)."""

    chr: str
    start: int
    end: int
    max_coverage: Optional[int] = None
    gene_id: Optional[str] = None

    def __str__(self) -> str:
        return f"{self.chr}:{self.start}-{self.end}"

    @property
    def length(self) -> int:
        return self.end - self.start

    @staticmethod
    def parse(region: str) -> "Region":
        """Parse "chr:start-end" (util.rs:35-65)."""
        if ":" not in region:
            return Region(chr=region, start=0, end=0, max_coverage=0)
        chrom, pos = region.split(":", 1)
        s, e = pos.split("-", 1)
        start, end = int(s), int(e)
        if start > end:
            raise ValueError(f"region format error: {region}")
        return Region(chr=chrom, start=start, end=end, max_coverage=0)


def read_qc_mask(bam: BamFile, cfg: CallerConfig) -> np.ndarray:
    """Vectorised read QC shared by every BAM pass of the reference
    (util.rs:652-668, fragment.rs:32-49): mapq, read length, flags, and the
    ``de`` (gap-compressed divergence) aux tag."""
    bad_flags = FLAG_UNMAPPED | FLAG_SECONDARY | FLAG_SUPPLEMENTARY
    mask = (
        (bam.mapq >= cfg.min_mapq)
        & (bam.l_seq >= cfg.min_read_length)
        & ((bam.flag & bad_flags) == 0)
    )
    # per-read `de` tag; absent tag passes (reference matches Ok(Float) only)
    idx = np.nonzero(mask)[0]
    for i in idx:
        de = bam.read(int(i)).get_tag("de")
        if isinstance(de, float) and de >= cfg.divergence:
            mask[i] = False
    return mask


def find_isolated_regions_with_depth(
    bam: BamFile,
    chrom: str,
    ref_len: int,
    cfg: CallerConfig,
    qc_mask: Optional[np.ndarray] = None,
) -> List[Region]:
    """Depth-scan one contig into isolated regions (util.rs:236-332)."""
    lo, hi = bam.contig_record_range(chrom)
    if lo == hi:
        return []
    if qc_mask is None:
        qc_mask = read_qc_mask(bam, cfg)
    # depth via difference array over QC-pass reads
    diff = np.zeros(ref_len + 1, dtype=np.int64)
    for i in range(lo, hi):
        if not qc_mask[i]:
            continue
        r = bam.read(i)
        start = r.pos
        end = r.reference_end()
        if start < ref_len:
            diff[start] += 1
            diff[min(end, ref_len)] -= 1
    depth = np.cumsum(diff[:-1])

    brk = depth == 0
    if cfg.truncation:
        brk |= depth > cfg.truncation_coverage
    keep = ~brk
    if not keep.any():
        return []
    # maximal runs of keep
    edges = np.diff(keep.astype(np.int8))
    run_starts = np.nonzero(edges == 1)[0] + 1
    run_ends = np.nonzero(edges == -1)[0]  # inclusive last-True index
    if keep[0]:
        run_starts = np.concatenate([[0], run_starts])
    if keep[-1]:
        run_ends = np.concatenate([run_ends, [ref_len - 1]])

    regions: List[Region] = []
    reset_pt = -1  # last position after which max_coverage was reset
    for s, e in zip(run_starts.tolist(), run_ends.tolist()):
        if e > s:
            # the breaking column e+1 (if any) updates max before the emit
            # check (util.rs:290-296), so include it in the max span
            span_end = e + 1 if e + 1 < ref_len else e
            max_cov = int(depth[reset_pt + 1: span_end + 1].max())
            regions.append(Region(chr=chrom, start=s + 1, end=e + 2,
                                  max_coverage=max_cov))
            reset_pt = span_end
        # single-column runs: no emit, no reset (depth folds into next max)
    return regions


def extract_isolated_regions_parallel(
    bam: BamFile,
    contig_lengths: Sequence[Tuple[str, int]],
    cfg: CallerConfig,
    contigs: Optional[Sequence[str]] = None,
) -> List[Region]:
    """All-contig region discovery (util.rs:558-602).

    Unlike the reference (one rayon task per contig, unordered Mutex extend),
    results are returned in contig order; downstream VCF emission sorts by
    contig order anyway.
    """
    lengths = dict(contig_lengths)
    names = list(contigs) if contigs is not None else [c for c, _ in contig_lengths]
    qc_mask = read_qc_mask(bam, cfg)

    def work(ctg: str) -> List[Region]:
        if ctg not in lengths:
            raise KeyError(f"contig {ctg} not in .fai")
        return find_isolated_regions_with_depth(bam, ctg, lengths[ctg], cfg, qc_mask)

    if cfg.threads > 1 and len(names) > 1:
        with ThreadPoolExecutor(max_workers=cfg.threads) as ex:
            per_contig = list(ex.map(work, names))
    else:
        per_contig = [work(c) for c in names]
    out: List[Region] = []
    for regs in per_contig:
        out.extend(regs)
    return out
