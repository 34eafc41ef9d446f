"""Scalar oracles for the assignment layer: literal transcriptions of
snpfrags.rs assign_reads_haplotype (548-625), assign_snp_haplotype_genotype
(378-546) and the rescue passes (191-376), operating on FragmentMatrix +
CandidateSet state."""

import math

from oracle_phase import aki, cal_delta_eta_sigma_log, cal_phase_score_log, \
    cal_sigma_delta_eta_log

PHASE_SCORE_SENTINEL = 0.19940219


def _cells_of_read(frags, k):
    out = []
    for i in range(frags.n_snps):
        if frags.p[k, i] != 0:
            out.append((i, int(frags.p[k, i]),
                        10.0 ** (-int(frags.baseq[k, i]) / 10.0)))
    return out


def assign_reads_haplotype(frags, cands, cfg, apply_ds):
    import numpy as np
    ds = frags.downsampled if apply_ds else np.ones(frags.n_frags, bool)
    out = {}
    for k in range(frags.n_frags):
        if not frags.for_phasing[k] or not ds[k]:
            continue
        sigma_k = int(frags.haplotag[k])
        delta, eta, ps, probs = [], [], [], []
        for (i, p, prob) in _cells_of_read(frags, k):
            if not cands.for_phasing[i]:
                continue
            if cands.haplotype[i] == 0:
                continue
            if cands.genotype[i] != 0:
                continue
            ps.append(p)
            probs.append(prob)
            delta.append(int(cands.haplotype[i]))
            eta.append(int(cands.genotype[i]))
        if sigma_k == 0:
            frags.assignment[k] = 0
            frags.haplotag[k] = 0
            frags.assignment_score[k] = 0.0
            out[frags.qnames[k]] = 0
            continue
        if not delta:
            frags.assignment[k] = 0
            frags.haplotag[k] = 0
            frags.assignment_score[k] = 0.0
            out[frags.qnames[k]] = 0
            continue
        q = cal_sigma_delta_eta_log(sigma_k, delta, eta, ps, probs)
        qn = cal_sigma_delta_eta_log(-sigma_k, delta, eta, ps, probs)
        if abs(q - qn) >= cfg.min_read_assignment_diff:
            if q >= qn:
                frags.assignment[k] = 1 if sigma_k == 1 else 2
                frags.assignment_score[k] = q
            else:
                frags.assignment[k] = 2 if sigma_k == 1 else 1
                frags.assignment_score[k] = qn
                frags.haplotag[k] = -sigma_k
            out[frags.qnames[k]] = int(frags.assignment[k])
        else:
            frags.assignment[k] = 0
            frags.haplotag[k] = 0
            frags.assignment_score[k] = 0.0
            out[frags.qnames[k]] = 0
    return out


def assign_snp_haplotype_genotype(frags, cands, cfg, apply_ds):
    import numpy as np
    ds = frags.downsampled if apply_ds else np.ones(frags.n_frags, bool)
    for i in range(cands.n):
        if not cands.for_phasing[i]:
            cands.non_selected[i] = True
            continue
        if not (frags.p[:, i] != 0).any():
            cands.single[i] = True
            continue
        delta_i = int(cands.haplotype[i])
        sigma, ps, probs = [], [], []
        h1 = h2 = 0
        vt_i = int(cands.variant_type[i])
        for k in range(frags.n_frags):
            if frags.p[k, i] == 0:
                continue
            if not frags.for_phasing[k] or frags.num_hete_links[k] < cfg.min_linkers:
                continue
            if not ds[k]:
                continue
            if vt_i == 1 and frags.assignment[k] == 0:
                continue
            if frags.assignment[k] == 1:
                h1 += 1
            elif frags.assignment[k] == 2:
                h2 += 1
            ps.append(int(frags.p[k, i]))
            probs.append(10.0 ** (-int(frags.baseq[k, i]) / 10.0))
            sigma.append(int(frags.haplotag[k]))
        if not sigma:
            cands.non_selected[i] = True
            continue
        q1 = cal_delta_eta_sigma_log(delta_i, 0, sigma, ps, probs)
        q2 = cal_delta_eta_sigma_log(-delta_i, 0, sigma, ps, probs)
        q3 = cal_delta_eta_sigma_log(delta_i, 1, sigma, ps, probs)
        q4 = cal_delta_eta_sigma_log(delta_i, -1, sigma, ps, probs)
        mx = max(q1, q2, q3, q4)
        if q1 == mx:
            cands.genotype[i] = 0
            cands.variant_type[i] = 1
        elif q2 == mx:
            cands.haplotype[i] = -delta_i
            cands.genotype[i] = 0
            cands.variant_type[i] = 1
        elif q3 == mx:
            cands.genotype[i] = 1
            cands.variant_type[i] = 0
        else:
            cands.genotype[i] = -1
            if cands.variant_type[i] not in (2, 3):
                cands.variant_type[i] = 2
        if cands.genotype[i] != 0:
            cands.non_selected[i] = True
            continue
        if sigma and h1 >= 1 and h2 >= 1:
            q = cal_phase_score_log(int(cands.haplotype[i]), 0, sigma, ps, probs)
            cands.phase_score[i] = -10.0 * math.log10(1.0 - q)
        else:
            cands.phase_score[i] = PHASE_SCORE_SENTINEL
