"""Scalar oracle transcription of the ASE analysis script
(``/root/reference/allele_specific/longcallR-ase.py``), for differential
testing of ``longcallr_tpu/analysis/ase.py`` (C21).

Transcription policy (mirrors tests/oracle_pipeline.py): every algorithmic
step is re-derived line-by-line from the reference with naive scalar
code — no production interval/stats helpers. Library substitutions:

* pysam AlignmentFile       -> longcallr_tpu.io.bam.BamFile (record access
  only; fetch carries the same htslib [start, end) overlap semantics, incl.
  the reference's 1-based-start-passed-as-0-based quirk at :455/:518);
* intervaltree              -> naive O(n^2) scans transcribing the exact
  query forms, incl. the half-open candidate query over a CLOSED splice
  segment (:249-253 — an exon starting at the segment's last base counts 0);
* scipy.stats.betabinom     -> used directly (:10, :43-51);
* statsmodels multipletests -> scalar transcription of fdr_bh (:623).

Documented deviations (PARITY.md #10) are mirrored so the byte gate is
meaningful where the reference is set-iteration-nondeterministic: dominant
phase set ties -> smallest PS id; read->gene assignment ties -> first gene
in merged-exon start order; output rows in annotation order (the reference
emits ProcessPool completion order).
"""

from collections import defaultdict

import numpy as np
from scipy.stats import betabinom

from longcallr_tpu.io.bam import BamFile

# BAM cigar op codes (SAM spec): M=0 I=1 D=2 N=3 S=4 H=5 P=6 ==7 X=8
FLAG_SECONDARY, FLAG_QCFAIL, FLAG_DUP = 0x100, 0x200, 0x400


def cigartuples(read):
    """pysam-style [(op, length)] from raw BAM cigar words."""
    return [(int(w) & 0xF, int(w) >> 4) for w in read.cigar]


# ---------------------------------------------------------------------------
# longcallR-ase.py:15-61
# ---------------------------------------------------------------------------

def oracle_convert_mu_rho(mu, rho):
    phi = (1 - rho) / rho - 1
    return mu * phi, (1 - mu) * phi


def oracle_beta_binomial_p_value(k_obs, n, mu, rho):
    """two-sided branch of beta_binomial_p_value (:25-61), verbatim."""
    alpha, beta_param = oracle_convert_mu_rho(mu, rho)
    bb = betabinom(n, alpha, beta_param)
    p_obs = bb.pmf(k_obs)
    pmf_values = [bb.pmf(k) for k in range(n + 1)]
    return sum(p for p in pmf_values if p <= p_obs)


# ---------------------------------------------------------------------------
# annotation: longcallR-ase.py:64-194
# ---------------------------------------------------------------------------

def _parse_attributes_gff3(attributes):
    attr_dict = {}
    for attr in attributes.strip().split(";"):
        key, value = attr.strip().split("=")
        attr_dict[key] = value.replace('"', "")
    return attr_dict


def _parse_attributes_gtf(attributes):
    attr_dict = {}
    for attr in attributes.strip().split(";"):
        if attr:
            key, value = attr.strip().split(" ")
            if key == "tag":
                attr_dict[key] = attr_dict.get(key, []) + [value.replace('"', "")]
            else:
                attr_dict[key] = value.replace('"', "")
    attr_dict["tag"] = ",".join(attr_dict.get("tag", []))
    return attr_dict


def oracle_get_gene_regions(annotation_file, gene_types):
    """(gene_regions, gene_names, gene_strands, exon_regions,
    intron_regions) — :64-163."""
    import gzip

    gene_regions = {}
    gene_names = {}
    gene_strands = {}
    exon_regions = defaultdict(lambda: defaultdict(list))
    intron_regions = defaultdict(lambda: defaultdict(list))
    open_func = gzip.open if annotation_file.endswith(".gz") else open
    file_type = "gff3" if ".gff3" in annotation_file else "gtf"
    with open_func(annotation_file, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.strip().split("\t")
            feature_type = parts[2]
            attributes = parts[8]
            if file_type == "gff3":
                attr_dict = _parse_attributes_gff3(attributes)
            else:
                attr_dict = _parse_attributes_gtf(attributes)
            if feature_type == "gene":
                gene_id = attr_dict["gene_id"]
                try:
                    gene_type = attr_dict["gene_type"]
                except KeyError:
                    gene_type = attr_dict["gene_biotype"]
                tag = attr_dict.get("tag", "")
                try:
                    gene_name = attr_dict["gene_name"]
                except KeyError:
                    gene_name = "."
                if gene_type in gene_types and "readthrough" not in tag:
                    gene_regions[gene_id] = {"chr": parts[0],
                                             "start": int(parts[3]),
                                             "end": int(parts[4])}
                    gene_names[gene_id] = gene_name
                    gene_strands[gene_id] = parts[6]
            elif feature_type == "exon":
                try:
                    gene_type = attr_dict["gene_type"]
                except KeyError:
                    gene_type = attr_dict["gene_biotype"]
                transcript_id = attr_dict["transcript_id"]
                gene_id = attr_dict["gene_id"]
                tag = attr_dict.get("tag", "")
                if gene_type in gene_types and "readthrough" not in tag:
                    exon_regions[gene_id][transcript_id].append(
                        (parts[0], int(parts[3]), int(parts[4])))
    # introns from exons (:150-163)
    for gene_id, transcripts in exon_regions.items():
        for transcript_id, exons in transcripts.items():
            if len(exons) == 1:
                continue
            exons_sorted = sorted(exons, key=lambda x: x[1])
            for i in range(1, len(exons_sorted)):
                intron_start = exons_sorted[i - 1][2] + 1
                intron_end = exons_sorted[i][1] - 1
                if intron_start < intron_end:
                    intron_regions[gene_id][transcript_id].append(
                        (exons_sorted[i - 1][0], intron_start, intron_end))
    return gene_regions, gene_names, gene_strands, exon_regions, intron_regions


def oracle_merge_gene_exon_regions(exon_regions):
    """:166-194 — IntervalTree.merge_overlaps merges strictly-overlapping
    half-open intervals (touching ones stay separate)."""
    merged_genes_exons = defaultdict(lambda: defaultdict(list))
    for gene_id, transcripts in exon_regions.items():
        chr_set = set()
        for exons in transcripts.values():
            for (chrom, s, e) in exons:
                chr_set.add(chrom)
        if len(chr_set) > 1:
            continue
        chromosome = None
        ivs = []
        for exons in transcripts.values():
            for (chrom, s, e) in exons:
                chromosome = chrom
                ivs.append((s, e + 1))          # half-open
        ivs.sort()
        out = []
        for s, e in ivs:
            if out and s < out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        merged_genes_exons[chromosome][gene_id].extend(
            (s, e - 1) for (s, e) in out)       # back to 1-based closed
    return merged_genes_exons


# ---------------------------------------------------------------------------
# read -> gene assignment: longcallR-ase.py:197-258
# ---------------------------------------------------------------------------

def _splice_regions(read):
    """:228-241 — 1-based closed M/D/=/X runs split at N."""
    splice_regions = []
    current_pos = read.pos + 1
    shift = 0
    for operation, length in cigartuples(read):
        if operation in (0, 2, 7, 8):
            shift += length
        elif operation == 3:
            if shift > 0:
                splice_regions.append((current_pos, current_pos + shift - 1))
            current_pos += shift + length
            shift = 0
    if shift > 0:
        splice_regions.append((current_pos, current_pos + shift - 1))
    return splice_regions


def _segment_exon_overlap(segs, merged_exons):
    """:249-253 — candidate exons from the HALF-OPEN query [a, b) over the
    CLOSED segment [a, b], each contributing its closed-interval overlap."""
    total = 0
    for (a, b) in segs:
        for (es, ee) in merged_exons:           # iv = [es, ee+1)
            if es < b and ee + 1 > a:           # tree.overlap(a, b)
                total += max(0, min(b, ee) - max(a, es) + 1)
    return total


def oracle_assign_reads_to_gene(bam: BamFile, merged_genes_exons):
    """:197-258 serial walk; ties -> first gene in merged-exon start order
    (PARITY.md #10; reference max() over intervaltree set order)."""
    # per-chrom gene list in merged-span start order (stable by insertion)
    genes_by_chr = {}
    for chrom, genes in merged_genes_exons.items():
        lst = [(merged[0][0], k, gid, merged)
               for k, (gid, merged) in enumerate(genes.items())]
        lst.sort(key=lambda t: (t[0], t[1]))
        genes_by_chr[chrom] = [(gid, merged) for _, _, gid, merged in lst]
    read_assignment = {}
    for i in range(bam.n_records):
        read = bam.read(i)
        if read.is_unmapped:
            continue
        chromosome = bam.references[read.ref_id]
        if chromosome not in genes_by_chr:
            continue
        s1 = read.pos + 1                       # 1-based start
        e1x = read.reference_end() + 1          # query end (half-open)
        cands = []
        for gid, merged in genes_by_chr[chromosome]:
            span_s, span_e = merged[0][0], merged[-1][1]
            if span_s < e1x and span_e + 1 > s1:    # trees.overlap(s1, e1x)
                cands.append((gid, merged))
        if not cands:
            continue
        segs = _splice_regions(read)
        best_gene, best_len = None, -1
        for gid, merged in cands:
            ov = _segment_exon_overlap(segs, merged)
            if ov > best_len:
                best_gene, best_len = gid, ov
        if best_gene is not None:
            read_assignment[read.qname] = best_gene
    return read_assignment


def oracle_transform_read_assignment(read_assignment):
    gene_assigned_reads = defaultdict(list)
    for read_name, gene_id in read_assignment.items():
        gene_assigned_reads[gene_id].append(read_name)
    return gene_assigned_reads


# ---------------------------------------------------------------------------
# VCF loaders: longcallR-ase.py:360-441 (text VCF; pysam VariantFile there)
# ---------------------------------------------------------------------------

def _iter_vcf(vcf_file):
    import gzip
    opener = gzip.open if vcf_file.endswith((".gz", ".bgz")) else open
    with opener(vcf_file, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 10:
                continue
            yield parts


def _gt_of(parts):
    fmt = parts[8].split(":")
    sample = parts[9].split(":")
    d = dict(zip(fmt, sample))
    gt = d.get("GT", ".")
    phased = "|" in gt
    al = gt.replace("|", "/").split("/")
    try:
        gt_t = tuple(int(a) for a in al)
    except ValueError:
        gt_t = None
    return gt_t, phased, d


def oracle_load_whole_genome_phased_vcf(vcf_file):
    """:360-385."""
    wg_vcfs = {}
    for parts in _iter_vcf(vcf_file):
        ref, alts = parts[3], parts[4].split(",")
        if any(len(ref) != len(alt) for alt in alts):
            continue
        gt, phased, _ = _gt_of(parts)
        if gt in ((0, 1), (1, 0)) and phased:
            key = f"{parts[0]}:{parts[1]}"
            if gt == (0, 1):
                wg_vcfs[key] = {"gt": gt, "pat": alts[0], "mat": ref}
            else:
                wg_vcfs[key] = {"gt": gt, "pat": ref, "mat": alts[0]}
    return wg_vcfs


def oracle_load_dna_vcf(vcf_file):
    """:388-408."""
    dna_vcfs = {}
    for parts in _iter_vcf(vcf_file):
        ref, alts = parts[3], parts[4].split(",")
        if any(len(ref) != len(alt) for alt in alts):
            continue
        gt, _, _ = _gt_of(parts)
        if gt in ((0, 1), (1, 0)):
            dna_vcfs[f"{parts[0]}:{parts[1]}"] = {"gt": gt, "ref": ref,
                                                  "alt": alts[0]}
    return dna_vcfs


def oracle_load_longcallR_phased_vcf(vcf_file, with_dp_af=False):
    """:411-441 — PS keys are ints (pysam Integer FORMAT)."""
    import math
    rna_vcfs = defaultdict(list)
    for parts in _iter_vcf(vcf_file):
        if parts[6] != "PASS":
            continue
        ref, alts = parts[3], parts[4].split(",")
        if any(len(ref) != len(alt) for alt in alts):
            continue
        gt, phased, d = _gt_of(parts)
        if gt in ((0, 1), (1, 0)) and phased:
            ps = d.get("PS")
            if ps and ps != ".":
                try:
                    ps = int(ps)
                except ValueError:
                    pass
                if with_dp_af:
                    try:
                        dp = int(d["DP"])
                        af = float(d["AF"].split(",")[0])
                    except (KeyError, ValueError):
                        continue
                    if math.isnan(af) or dp == 0:
                        continue
                    rna_vcfs[ps].append(f"{parts[0]}:{parts[1]}:{dp}:{af}")
                else:
                    rna_vcfs[ps].append(f"{parts[0]}:{parts[1]}")
    return rna_vcfs


# ---------------------------------------------------------------------------
# per-gene ASE: longcallR-ase.py:444-597
# ---------------------------------------------------------------------------

def oracle_get_reads_tag(bam, chrom, start_pos, end_pos):
    """:444-451 — 1-based gene bounds passed as pysam 0-based fetch args
    (the reference's off-by-one quirk, preserved)."""
    reads_tag = {}
    for read in bam.fetch(chrom, start_pos, end_pos):
        ps = read.get_tag("PS")
        hp = read.get_tag("HP")
        reads_tag[read.qname] = {"PS": ps, "HP": hp}
    return reads_tag


def _ps_order(ps):
    """PARITY.md #10 tie rule (mirrors analysis/ase.py)."""
    return (0, ps, "") if isinstance(ps, int) else (1, 0, str(ps))


def _dominant_ps(reads_tag, assigned_reads):
    phase_set_hap_count = defaultdict(lambda: {1: 0, 2: 0})
    for rname in sorted(assigned_reads):
        if rname in reads_tag:
            ps = reads_tag[rname]["PS"]
            hp = reads_tag[rname]["HP"]
            if ps and hp:
                phase_set_hap_count[ps][hp] += 1
    if not phase_set_hap_count:
        return None, None
    best_cnt = max(c[1] + c[2] for c in phase_set_hap_count.values())
    best = min((ps for ps, c in phase_set_hap_count.items()
                if c[1] + c[2] == best_cnt), key=_ps_order)
    return best, phase_set_hap_count[best]


def oracle_calculate_ase_pvalue(bam, gene_id, gene_name, gene_region,
                                min_count, overdispersion,
                                gene_assigned_reads):
    """:454-478."""
    reads_tag = oracle_get_reads_tag(bam, gene_region["chr"],
                                     gene_region["start"], gene_region["end"])
    assigned_reads = set(gene_assigned_reads[gene_id])
    most_reads_ps, hap_count = _dominant_ps(reads_tag, assigned_reads)
    if most_reads_ps is None:
        return (gene_name, gene_region["chr"], 1.0, ".", 0, 0)
    if hap_count[1] + hap_count[2] < min_count:
        return (gene_name, gene_region["chr"], 1.0, most_reads_ps, 0, 0)
    p = oracle_beta_binomial_p_value(hap_count[1],
                                     hap_count[1] + hap_count[2],
                                     0.5, overdispersion)
    return (gene_name, gene_region["chr"], p, most_reads_ps,
            hap_count[1], hap_count[2])


def _pileup_bases_at(read, positions_set):
    """Scalar CIGAR walk: {ref_pos0: query_base_char} at M/=/X-aligned
    positions (the pileup's is_del/is_refskip skip, :522-526)."""
    out = {}
    seq = read.seq
    rpos = read.pos
    qpos = 0
    for op, ln in cigartuples(read):
        if op in (0, 7, 8):                     # M,=,X
            for k in range(ln):
                if rpos + k in positions_set:
                    out[rpos + k] = chr(int(seq[qpos + k]))
            rpos += ln
            qpos += ln
        elif op in (2, 3):                      # D,N
            rpos += ln
        elif op in (1, 4):                      # I,S
            qpos += ln
    return out


def oracle_calculate_ase_pvalue_pat_mat(bam, gene_id, gene_name, gene_region,
                                        min_count, overdispersion,
                                        gene_assigned_reads, rna_vcfs,
                                        wg_vcfs):
    """:481-553."""
    chrom = gene_region["chr"]
    reads_tag = oracle_get_reads_tag(bam, chrom, gene_region["start"],
                                     gene_region["end"])
    assigned_reads = set(gene_assigned_reads[gene_id])
    most_reads_ps, hap_count = _dominant_ps(reads_tag, assigned_reads)
    if most_reads_ps is None:
        return (gene_name, chrom, 1.0, ".", 0, 0, 0, 0, 0, 0)
    h1_count, h2_count = hap_count[1], hap_count[2]
    if h1_count + h2_count < min_count:
        return (gene_name, chrom, 1.0, ".", 0, 0, 0, 0, 0, 0)
    p = oracle_beta_binomial_p_value(h1_count, h1_count + h2_count,
                                     0.5, overdispersion)
    ps_variants = rna_vcfs.get(most_reads_ps, [])
    ps_reads = {r for r in assigned_reads
                if r in reads_tag and reads_tag[r]["PS"] == most_reads_ps}
    h1_reads = [r for r in sorted(ps_reads) if reads_tag[r]["HP"] == 1]
    h2_reads = [r for r in sorted(ps_reads) if reads_tag[r]["HP"] == 2]
    ps_variant_pos = {int(pos.split(":")[1]) - 1 for pos in ps_variants}
    # pileup(:518-533): columns from reads overlapping [start-1, end);
    # pysam's default stepper skips SECONDARY/QCFAIL/DUP records
    reads_pat_mat_cnt = defaultdict(lambda: {"pat": 0, "mat": 0})
    for read in bam.fetch(chrom, gene_region["start"] - 1,
                          gene_region["end"]):
        if read.flag & (0x4 | FLAG_SECONDARY | FLAG_QCFAIL | FLAG_DUP):
            continue
        if read.qname not in ps_reads:
            continue
        for pos0, base in _pileup_bases_at(read, ps_variant_pos).items():
            key = f"{chrom}:{pos0 + 1}"
            if key not in wg_vcfs:
                continue
            if base in wg_vcfs[key]["pat"]:
                reads_pat_mat_cnt[read.qname]["pat"] += 1
            elif base in wg_vcfs[key]["mat"]:
                reads_pat_mat_cnt[read.qname]["mat"] += 1
    h1_pat = h1_mat = h2_pat = h2_mat = 0
    for reads in h1_reads:
        if reads in reads_pat_mat_cnt:
            if reads_pat_mat_cnt[reads]["pat"] > reads_pat_mat_cnt[reads]["mat"]:
                h1_pat += 1
            elif reads_pat_mat_cnt[reads]["pat"] < reads_pat_mat_cnt[reads]["mat"]:
                h1_mat += 1
    for reads in h2_reads:
        if reads in reads_pat_mat_cnt:
            if reads_pat_mat_cnt[reads]["pat"] > reads_pat_mat_cnt[reads]["mat"]:
                h2_pat += 1
            elif reads_pat_mat_cnt[reads]["pat"] < reads_pat_mat_cnt[reads]["mat"]:
                h2_mat += 1
    return (gene_name, chrom, p, most_reads_ps, h1_count, h2_count,
            h1_pat, h1_mat, h2_pat, h2_mat)


def oracle_calculate_ase_pvalue_filtering(bam, gene_id, gene_name,
                                          gene_region, min_count,
                                          overdispersion,
                                          gene_assigned_reads, rna_vcfs,
                                          dna_vcfs):
    """:556-597."""
    chrom = gene_region["chr"]
    reads_tag = oracle_get_reads_tag(bam, chrom, gene_region["start"],
                                     gene_region["end"])
    assigned_reads = set(gene_assigned_reads[gene_id])
    most_reads_ps, hap_count = _dominant_ps(reads_tag, assigned_reads)
    if most_reads_ps is None:
        return (gene_name, chrom, 1.0, ".", 0, 0)
    h1_count, h2_count = hap_count[1], hap_count[2]
    if h1_count + h2_count < min_count:
        return (gene_name, chrom, 1.0, most_reads_ps, 0, 0)
    p = oracle_beta_binomial_p_value(h1_count, h1_count + h2_count,
                                     0.5, overdispersion)
    overlapped_cnt = 0
    for snp in rna_vcfs.get(most_reads_ps, []):
        ctg_pos = snp.split(":")[0] + ":" + snp.split(":")[1]
        if ctg_pos in dna_vcfs:
            depth = int(snp.split(":")[2])
            allele_fraction = float(snp.split(":")[3])
            alt_cnt = int(depth * allele_fraction)
            p_allele = oracle_beta_binomial_p_value(alt_cnt, depth, 0.5,
                                                    overdispersion)
            if depth >= min_count and p_allele < 0.05:
                overlapped_cnt += 1
    if overlapped_cnt == 0:
        return (gene_name, chrom, 1.0, ".", 0, 0)
    return (gene_name, chrom, p, most_reads_ps, h1_count, h2_count)


# ---------------------------------------------------------------------------
# BH + drivers: longcallR-ase.py:600-708
# ---------------------------------------------------------------------------

def oracle_fdr_bh(p_values):
    """Scalar transcription of statsmodels multipletests(method='fdr_bh')
    (the reference's :623): sorted p / ecdffactor, suffix cummin, clip."""
    n = len(p_values)
    order = sorted(range(n), key=lambda i: p_values[i])
    adj = [0.0] * n
    cur = float("inf")
    for k in range(n - 1, -1, -1):
        raw = p_values[order[k]] / ((k + 1) / float(n))
        cur = min(cur, raw)
        adj[k] = min(cur, 1.0)
    out = [0.0] * n
    for k, i in enumerate(order):
        out[i] = adj[k]
    return out


def oracle_analyze_ase(annotation_file, bam_path, threads_unused, gene_types,
                       min_support, overdispersion,
                       vcf1=None, vcf2=None, vcf3=None) -> str:
    """Full pipeline -> TSV text (:600-708; row order = annotation order,
    PARITY.md #10)."""
    (gene_regions, gene_names, _, exon_regions,
     _) = oracle_get_gene_regions(annotation_file, gene_types)
    merged = oracle_merge_gene_exon_regions(exon_regions)
    bam = BamFile(bam_path)
    read_assignment = oracle_assign_reads_to_gene(bam, merged)
    gene_assigned_reads = oracle_transform_read_assignment(read_assignment)
    mode = "plain"
    if vcf1 and vcf2:
        mode = "patmat"
        rna_vcfs = oracle_load_longcallR_phased_vcf(vcf1)
        wg_vcfs = oracle_load_whole_genome_phased_vcf(vcf2)
    elif vcf1 and vcf3:
        mode = "filter"
        rna_vcfs = oracle_load_longcallR_phased_vcf(vcf1, with_dp_af=True)
        dna_vcfs = oracle_load_dna_vcf(vcf3)
    results = []
    for gene_id in gene_regions.keys():
        if gene_id not in gene_assigned_reads:
            continue
        args = (bam, gene_id, gene_names[gene_id], gene_regions[gene_id],
                min_support, overdispersion, gene_assigned_reads)
        if mode == "patmat":
            results.append(oracle_calculate_ase_pvalue_pat_mat(
                *args, rna_vcfs, wg_vcfs))
        elif mode == "filter":
            results.append(oracle_calculate_ase_pvalue_filtering(
                *args, rna_vcfs, dna_vcfs))
        else:
            results.append(oracle_calculate_ase_pvalue(*args))
    pass_idx, p_values = [], []
    for idx, row in enumerate(results):
        if row[4] + row[5] >= min_support:
            pass_idx.append(idx)
            p_values.append(row[2])
    adjusted = oracle_fdr_bh(p_values)
    lines = []
    if mode == "patmat":
        lines.append("#Gene_name\tChr\tPS\tH1\tH2\tP_value\tH1_Paternal\t"
                     "H1_Maternal\tH2_Paternal\tH2_Maternal")
        for pi, idx in enumerate(pass_idx):
            (gene_name, chrom, _, ps, h1, h2,
             h1p, h1m, h2p, h2m) = results[idx]
            lines.append(f"{gene_name}\t{chrom}\t{ps}\t{h1}\t{h2}\t"
                         f"{adjusted[pi]}\t{h1p}\t{h1m}\t{h2p}\t{h2m}")
    else:
        lines.append("#Gene_name\tChr\tPS\tH1\tH2\tP_value")
        for pi, idx in enumerate(pass_idx):
            gene_name, chrom, _, ps, h1, h2 = results[idx]
            lines.append(f"{gene_name}\t{chrom}\t{ps}\t{h1}\t{h2}\t"
                         f"{adjusted[pi]}")
    return "\n".join(lines) + "\n"
