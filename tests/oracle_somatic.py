"""Scalar oracle transcription of the reference somatic-by-het path:

  * get_somatic_haplotype_baseqs  (snpfrags.rs:56-189) — the dedicated
    third BAM pass gathering per-haplotype ref/alt base quals at
    candidate-somatic sites;
  * calculate_prob_somatic        (somatic.rs:5-80);
  * detect_somatic_by_het         (snpfrags.rs:735-771).

Transcribed per-element (scalar loops, sequential f64 products) for
bit-exact comparison against the production gather
(longcallr_tpu.phasing.fragments.gather_somatic_hap_quals) +
classifier (longcallr_tpu.ops.somatic.detect_somatic_by_het).
"""

from typing import Dict, List, Tuple

import numpy as np

_OPS = "MIDNSHP=X"


def scalar_gather(bam, region, cands, phased: Dict[str, int]
                  ) -> Dict[int, Tuple[List[int], List[int], List[int], List[int]]]:
    """snpfrags.rs:56-189. ``phased``: qname → assignment (1/2 only).
    Returns {cand_idx: (h1_ref, h1_alt, h2_ref, h2_alt) baseq lists} at
    every candidate-time somatic site, in BAM fetch order."""
    som = [i for i in range(cands.n) if cands.cand_somatic[i]]
    quals: Dict[int, Tuple[List[int], ...]] = {
        i: ([], [], [], []) for i in som}
    if not som:
        return quals
    last_pos = int(cands.pos[som[-1]])
    lo, hi, omask = bam.overlap_range(region.chr, region.start, region.end)
    for k in range(lo, hi):
        if not omask[k - lo]:
            continue
        r = bam.read(k)
        if r.flag & (0x4 | 0x100 | 0x800):   # unmapped/secondary/supplementary
            continue
        qn = r.qname
        if qn not in phased:
            continue
        assignment = phased[qn]
        if r.pos > last_pos:
            continue
        # find the first somatic SNP at/after the read start (rs:88-104)
        idx = 0
        while idx < len(som) and cands.pos[som[idx]] < r.pos:
            idx += 1
        pos_on_ref = r.pos
        pos_on_query = r.leading_softclips()
        seq = r.seq
        qual = r.qual
        for op, ln in zip(r.cigar_ops.tolist(), r.cigar_lens.tolist()):
            ch = _OPS[op]
            if ch in "SH":
                continue
            if ch in "M=X":
                for _ in range(ln):
                    if idx < len(som) and pos_on_ref == cands.pos[som[idx]]:
                        i = som[idx]
                        base = chr(seq[pos_on_query])
                        bq = int(qual[pos_on_query])
                        bq = bq if bq < 30 else 30
                        a1 = chr(cands.alleles[i, 0])
                        a2 = chr(cands.alleles[i, 1])
                        refb = chr(cands.ref_base[i])
                        if a1 == refb or a2 == refb:          # rs:122
                            if base == a1 or base == a2:      # rs:123
                                which = 0 if base == refb else 1
                                quals[i][(assignment - 1) * 2 + which].append(bq)
                        idx += 1
                    pos_on_query += 1
                    pos_on_ref += 1
            elif ch == "I":
                pos_on_query += ln
            elif ch in "DN":
                for _ in range(ln):
                    if idx < len(som) and pos_on_ref == cands.pos[som[idx]]:
                        idx += 1
                    pos_on_ref += 1
    return quals


def scalar_hap_class(ref_baseqs: List[int], alt_baseqs: List[int],
                     purity: float) -> Tuple[int, float]:
    """somatic.rs:12-44 (one haplotype block), sequential f64 products."""
    som_rate = 5.0 / 1000000.0
    het_rate = 1.0 / 2000.0
    ref_rate = 1.0 - het_rate - som_rate
    prob_read_ref = 1.0
    prob_read_het = 1.0
    prob_read_som = 1.0
    for q in ref_baseqs:
        epsilon = 10.0 ** (-(float(q) / 10.0))
        prob_read_ref *= 1.0 - epsilon
        prob_read_het *= epsilon
        prob_read_som *= purity * epsilon + (1.0 - purity) * (1.0 - epsilon)
    for q in alt_baseqs:
        epsilon = 10.0 ** (-(float(q) / 10.0))
        prob_read_ref *= epsilon
        prob_read_het *= 1.0 - epsilon
        prob_read_som *= purity * (1.0 - epsilon) + (1.0 - purity) * epsilon
    wr = prob_read_ref * ref_rate
    wh = prob_read_het * het_rate
    ws = prob_read_som * som_rate
    pr = wr / (wr + wh + ws)
    ph = wh / (wr + wh + ws)
    ps = ws / (wr + wh + ws)
    if ps > pr and ps > ph:
        return 2, ps
    elif ph > pr and ph > ps:
        return 1, ph
    return 0, pr


def scalar_detect(cands, quals, purity: float = 0.3
                  ) -> Dict[int, Tuple[bool, int, float]]:
    """snpfrags.rs:750-770. Returns {cand_idx: (somatic, variant_type,
    somatic_score)} for sites that classify (one hap ref, other som)."""
    out: Dict[int, Tuple[bool, int, float]] = {}
    for i, (h1r, h1a, h2r, h2a) in quals.items():
        c1, p1 = scalar_hap_class(h1r, h1a, purity)
        c2, p2 = scalar_hap_class(h2r, h2a, purity)
        if c1 == 0 and c2 == 2:
            with np.errstate(divide="ignore"):
                score = float(-10.0 * np.log10(np.float64(1.0 - p2)))
            out[i] = (True, 1, score)
        elif c1 == 2 and c2 == 0:
            with np.errstate(divide="ignore"):
                score = float(-10.0 * np.log10(np.float64(1.0 - p1)))
            out[i] = (True, 1, score)
    return out
