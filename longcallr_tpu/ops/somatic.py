"""Per-haplotype somatic mutation posterior.

Port of ``longcallR/src/somatic.rs:5-80`` (calculate_prob_somatic) and
``src/snpfrags.rs:735-771`` (detect_somatic_by_het). The call site is
commented out in the reference's default path (thread.rs:187); here it is
exposed behind ``CallerConfig``-level opt-in for completeness, vectorised
over candidate sites.

Priors: som 5e-6, het 5e-4 per haplotype; ``purity`` mixes alt/ref error
channels for the somatic class (0.3 at the reference call site).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

SOM_RATE = 5.0 / 1_000_000.0
HET_RATE = 1.0 / 2_000.0
REF_RATE = 1.0 - HET_RATE - SOM_RATE


def _hap_class(ref_baseqs: np.ndarray, alt_baseqs: np.ndarray,
               purity: float) -> Tuple[int, float]:
    """Posterior class for one haplotype: 0 ref, 1 het, 2 som, with its
    probability (somatic.rs:12-44)."""
    eps_r = 10.0 ** (-(np.asarray(ref_baseqs, np.float64) / 10.0))
    eps_a = 10.0 ** (-(np.asarray(alt_baseqs, np.float64) / 10.0))
    p_ref = np.prod(1.0 - eps_r) * np.prod(eps_a)
    p_het = np.prod(eps_r) * np.prod(1.0 - eps_a)
    p_som = (np.prod(purity * eps_r + (1.0 - purity) * (1.0 - eps_r))
             * np.prod(purity * (1.0 - eps_a) + (1.0 - purity) * eps_a))
    wr = p_ref * REF_RATE
    wh = p_het * HET_RATE
    ws = p_som * SOM_RATE
    total = wr + wh + ws
    pr, ph, ps = wr / total, wh / total, ws / total
    if ps > pr and ps > ph:
        return 2, float(ps)
    if ph > pr and ph > ps:
        return 1, float(ph)
    return 0, float(pr)


def calculate_prob_somatic(hap1_ref_baseqs, hap1_alt_baseqs,
                           hap2_ref_baseqs, hap2_alt_baseqs,
                           purity: float = 0.3):
    """(hap1_class, hap1_prob, hap2_class, hap2_prob) — somatic.rs:5-80."""
    c1, p1 = _hap_class(hap1_ref_baseqs, hap1_alt_baseqs, purity)
    c2, p2 = _hap_class(hap2_ref_baseqs, hap2_alt_baseqs, purity)
    return c1, p1, c2, p2


def detect_somatic_by_het(frags, cands, purity: float = 0.3) -> None:
    """snpfrags.rs:735-771: for each candidate-somatic site, split base
    quals by the phased read assignment; 'somatic' iff one haplotype is
    called ref and the other som. Sets cands.somatic / somatic_score /
    variant_type.

    Works directly off the fragment matrix (cells carry p/baseq for ref and
    alt alleles at biallelic-with-ref sites), rather than the reference's
    third BAM pass (snpfrags.rs:56-189)."""
    som_idx = np.nonzero(cands.cand_somatic)[0]
    if som_idx.size == 0 or frags.n_frags == 0:
        return
    assigned = frags.assignment  # 1/2 from the phasing pass
    ref_in = ((cands.alleles[:, 0] == cands.ref_base)
              | (cands.alleles[:, 1] == cands.ref_base))
    for i in som_idx.tolist():
        if not ref_in[i]:
            continue
        col_p = frags.p[:, i]
        col_q = frags.baseq[:, i]
        h1r = col_q[(assigned == 1) & (col_p == 1)]
        h1a = col_q[(assigned == 1) & (col_p == -1)]
        h2r = col_q[(assigned == 2) & (col_p == 1)]
        h2a = col_q[(assigned == 2) & (col_p == -1)]
        c1, p1, c2, p2 = calculate_prob_somatic(h1r, h1a, h2r, h2a, purity)
        if c1 == 0 and c2 == 2:
            score = -10.0 * np.log10(max(1e-300, 1.0 - p2))
        elif c1 == 2 and c2 == 0:
            score = -10.0 * np.log10(max(1e-300, 1.0 - p1))
        else:
            continue
        cands.somatic[i] = True
        cands.variant_type[i] = 1
        cands.somatic_score[i] = float(score)
