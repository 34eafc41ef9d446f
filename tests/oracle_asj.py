"""Scalar oracle transcription of the ASJ analysis script
(``/root/reference/allele_specific/longcallR-asj.py``), for differential
testing of ``longcallr_tpu/analysis/asj.py`` (C22).

Same transcription policy as tests/oracle_ase.py. Library substitutions:
pysam -> longcallr_tpu.io.{bam,fasta} (record/sequence access only);
intervaltree -> naive scans with the reference's exact query forms;
networkx -> used DIRECTLY for junction clustering (:339-440) — a true
differential against the production union-find; scipy fisher_exact/chi2
used directly (:13, :556-637); statsmodels -> scalar fdr_bh transcription.

Mirrored PARITY.md #10 deviations (the reference is set-iteration-
nondeterministic there): dominant phase set ties -> smallest PS id;
junction clusters ordered by smallest member (members sorted); assignment
ties -> first gene in merged-exon start order; genes processed in
annotation order (reference: ProcessPool completion order).
"""

import math
from collections import defaultdict

import numpy as np
from scipy.stats import chi2, fisher_exact

from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.io.fasta import FastaFile

from oracle_ase import (_dominant_ps, _ps_order, _segment_exon_overlap,
                        _splice_regions, cigartuples, oracle_fdr_bh,
                        oracle_get_gene_regions, oracle_load_dna_vcf,
                        oracle_load_longcallR_phased_vcf,
                        oracle_merge_gene_exon_regions)


# ---------------------------------------------------------------------------
# longcallR-asj.py:121-164
# ---------------------------------------------------------------------------

def oracle_get_exon_intron_regions(read, ref_seq: bytes, no_gtag: bool):
    exon_regions = []
    intron_regions = []
    current_position = read.pos + 1             # 1-based
    for operation, length in cigartuples(read):
        if operation in (0, 7, 8):
            if exon_regions and exon_regions[-1][1] + 1 == current_position:
                exon_regions[-1] = (exon_regions[-1][0],
                                    exon_regions[-1][1] + length)
            else:
                exon_regions.append((current_position,
                                     current_position + length - 1))
            current_position += length
        elif operation == 2:                    # D stays part of the exon
            if exon_regions and exon_regions[-1][1] + 1 == current_position:
                exon_regions[-1] = (exon_regions[-1][0],
                                    exon_regions[-1][1] + length)
            else:
                exon_regions.append((current_position,
                                     current_position + length - 1))
            current_position += length
        elif operation == 3:                    # N = intron
            intron_start = current_position
            intron_end = current_position + length - 1
            intron_left_seq = ref_seq[intron_start - 1: intron_start + 1].upper()
            intron_right_seq = ref_seq[intron_end - 2: intron_end].upper()
            if no_gtag:
                intron_regions.append((intron_start, intron_end, False))
            else:
                if (intron_left_seq == b"GT" and intron_right_seq == b"AG") or \
                        (intron_left_seq == b"CT" and intron_right_seq == b"AC"):
                    intron_regions.append((intron_start, intron_end, True))
                else:
                    intron_regions.append((intron_start, intron_end, False))
            current_position += length
    return exon_regions, intron_regions


# ---------------------------------------------------------------------------
# load_reads: longcallR-asj.py:198-329 (serial record-order semantics;
# the reference's chunked pool is last-completion-wins on duplicate qnames)
# ---------------------------------------------------------------------------

def oracle_load_reads(bam: BamFile, fasta: FastaFile, merged_genes_exons,
                      no_gtag: bool, min_junctions: int = 0):
    genes_by_chr = {}
    for chrom, genes in merged_genes_exons.items():
        lst = [(merged[0][0], k, gid, merged)
               for k, (gid, merged) in enumerate(genes.items())]
        lst.sort(key=lambda t: (t[0], t[1]))
        genes_by_chr[chrom] = [(gid, merged) for _, _, gid, merged in lst]
    read_assignment = {}
    reads_positions = {}
    reads_tags = {}
    reads_exons = {}
    reads_junctions = {}
    ref_cache = {}
    for i in range(bam.n_records):
        read = bam.read(i)
        if read.is_unmapped:
            continue
        chromosome = bam.references[read.ref_id]
        if chromosome not in fasta:             # load_reads chunks gate on
            continue                            # the reference FASTA (:306)
        if chromosome not in ref_cache:
            ref_cache[chromosome] = bytes(fasta.fetch(chromosome))
        qname = read.qname
        hp = read.get_tag("HP")
        ps = read.get_tag("PS")
        reads_tags[qname] = {"PS": ps if ps is not None else ".",
                             "HP": hp if hp is not None else "."}
        ref_end = read.reference_end()
        reads_positions[qname] = (read.pos + 1, ref_end)
        exon_regions, intron_regions = oracle_get_exon_intron_regions(
            read, ref_cache[chromosome], no_gtag)
        if len(intron_regions) <= min_junctions:
            del reads_positions[qname]
            del reads_tags[qname]
            continue
        reads_exons[qname] = exon_regions
        reads_junctions[qname] = intron_regions
        s1 = read.pos + 1
        e1x = ref_end + 1
        cands = []
        for gid, merged in genes_by_chr.get(chromosome, []):
            span_s, span_e = merged[0][0], merged[-1][1]
            if span_s < e1x and span_e + 1 > s1:
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
            read_assignment[qname] = best_gene
    return (read_assignment, reads_positions, reads_tags, reads_exons,
            reads_junctions)


# ---------------------------------------------------------------------------
# clustering: longcallR-asj.py:339-440 (networkx, like the reference)
# ---------------------------------------------------------------------------

def oracle_cluster_junctions(reads_junctions, reads_exons, min_count=10):
    """reads_exons=None -> cluster_junctions_connected_components (:339-375);
    else cluster_junctions_exons_connected_components (:378-440). Cluster
    order/membership order made deterministic per PARITY.md #10."""
    import networkx as nx

    junctions = {}
    gt_ag_dict = {}
    for read_name in sorted(reads_junctions):
        for (start, end, tag) in reads_junctions[read_name]:
            junctions[(start, end)] = junctions.get((start, end), 0) + 1
            gt_ag_dict[(start, end)] = tag
    junctions = {k: v for k, v in junctions.items() if v >= min_count}
    G = nx.Graph()
    for junction in junctions.keys():
        G.add_node((junction[0], junction[1], "junction"))
    junction_list = [(j[0], j[1], "junction") for j in junctions.keys()]
    merged_list = junction_list
    if reads_exons is not None:
        exons = {}
        for read_name in sorted(reads_exons):
            exon_regions = reads_exons[read_name]
            if len(exon_regions) > 2:
                for i, exon_region in enumerate(exon_regions):
                    if i == 0 or i == len(exon_regions) - 1:
                        continue
                    exons[exon_region] = exons.get(exon_region, 0) + 1
        exons = {k: v for k, v in exons.items() if v >= min_count}
        for exon in exons.keys():
            G.add_node((exon[0] - 1, exon[1] + 1, "exon"))
        exon_list = [(e[0] - 1, e[1] + 1, "exon") for e in exons.keys()]
        merged_list = junction_list + exon_list
    for i in range(len(merged_list)):
        for j in range(i + 1, len(merged_list)):
            start1, end1, type1 = merged_list[i]
            start2, end2, type2 = merged_list[j]
            if type1 == type2:
                if start1 == start2 or end1 == end2:
                    G.add_edge(merged_list[i], merged_list[j])
            else:
                if start1 == end2 or end1 == start2:
                    G.add_edge(merged_list[i], merged_list[j])
    junctions_clusters = []
    for component in nx.connected_components(G):
        clu = [(n[0], n[1], gt_ag_dict[(n[0], n[1])])
               for n in sorted(component) if n[2] == "junction"]
        if len(clu) > 0:
            junctions_clusters.append(clu)
    junctions_clusters.sort(key=lambda c: (c[0][0], c[0][1]))
    return junctions_clusters, junctions


def oracle_check_absent_present(start_pos, end_pos, reads_positions,
                                reads_junctions):
    """:443-468."""
    absent_reads = []
    present_reads = []
    for read_name in sorted(reads_positions):
        read_start, read_end = reads_positions[read_name]
        if read_start > end_pos or read_end < start_pos:
            continue
        present = False
        for junction_start, junction_end, _ in reads_junctions[read_name]:
            if junction_start == start_pos and junction_end == end_pos:
                present_reads.append(read_name)
                present = True
                break
        if not present:
            absent_reads.append(read_name)
    return absent_reads, present_reads


# ---------------------------------------------------------------------------
# statistics: longcallR-asj.py:556-637
# ---------------------------------------------------------------------------

def oracle_calc_sor(hap1_absent, hap1_present, hap2_absent, hap2_present):
    R = ((hap1_absent + 1) * (hap2_present + 1)) / \
        ((hap1_present + 1) * (hap2_absent + 1))
    R_inverse = 1 / R
    return math.log(R + R_inverse)


def oracle_g_test_2x2(table, pseudocount=1e-10):
    table = np.array(table)
    row_totals = table.sum(axis=1)
    col_totals = table.sum(axis=0)
    grand_total = table.sum()
    expected = np.outer(row_totals, col_totals) / grand_total
    observed = table + pseudocount
    expected = expected + pseudocount
    G = 2 * np.sum(observed * np.log(observed / expected))
    p_value = 1 - chi2.cdf(G, 1)
    return G, p_value


def oracle_haplotype_event_test(absent_reads, present_reads, reads_tags):
    """:592-637; dominant-PS tie -> smallest PS id (PARITY.md #10)."""
    hap_absent_counts = defaultdict(lambda: {1: 0, 2: 0})
    hap_present_counts = defaultdict(lambda: {1: 0, 2: 0})
    for read_name in absent_reads:
        hap_absent_counts[reads_tags[read_name]["PS"]][
            reads_tags[read_name]["HP"]] += 1
    for read_name in present_reads:
        hap_present_counts[reads_tags[read_name]["PS"]][
            reads_tags[read_name]["HP"]] += 1
    all_phase_sets = set(hap_absent_counts.keys()) | set(
        hap_present_counts.keys())
    if not all_phase_sets:
        return None
    ps_read_count = {
        ps: hap_absent_counts[ps][1] + hap_absent_counts[ps][2]
        + hap_present_counts[ps][1] + hap_present_counts[ps][2]
        for ps in all_phase_sets}
    best_cnt = max(ps_read_count.values())
    phase_set = min((p for p, c in ps_read_count.items() if c == best_cnt),
                    key=_ps_order)
    table = np.array([[hap_absent_counts[phase_set][1],
                       hap_absent_counts[phase_set][2]],
                      [hap_present_counts[phase_set][1],
                       hap_present_counts[phase_set][2]]])
    oddsratio, pvalue_fisher = fisher_exact(table)
    g_stat, pvalue_gtest = oracle_g_test_2x2(table)
    pvalue = max(pvalue_fisher, pvalue_gtest)
    sor = oracle_calc_sor(hap_absent_counts[phase_set][1],
                          hap_present_counts[phase_set][1],
                          hap_absent_counts[phase_set][2],
                          hap_present_counts[phase_set][2])
    return (phase_set, hap_absent_counts[phase_set][1],
            hap_present_counts[phase_set][1],
            hap_absent_counts[phase_set][2],
            hap_present_counts[phase_set][2], pvalue, sor)


# ---------------------------------------------------------------------------
# per-gene + drivers: longcallR-asj.py:667-1049
# ---------------------------------------------------------------------------

def oracle_analyze_gene(gene_name, gene_strand, annotation_exons,
                        annotation_junctions, gene_region, gene_reads,
                        min_count, cluster_with_exons, reads_positions,
                        reads_tags, reads_exons, reads_introns,
                        dna_vcfs=None, rna_vcfs=None):
    """:667-741 (plain) / :744-830 (filtering, when dna_vcfs given)."""
    valid_read_names = [q for q in gene_reads if q in reads_tags]
    phased_read_names = [q for q in valid_read_names
                         if reads_tags[q]["HP"] != "."]
    sub_reads_positions = {q: reads_positions[q] for q in phased_read_names}
    sub_reads_tags = {q: reads_tags[q] for q in phased_read_names}
    sub_reads_exons = {q: reads_exons[q] for q in phased_read_names}
    sub_reads_introns = {q: reads_introns[q] for q in phased_read_names}
    chrom = gene_region["chr"]
    gene_junction_set = set()
    for anno_junctions in annotation_junctions.values():
        for anno_junc in anno_junctions:
            gene_junction_set.add(anno_junc)
    gene_exon_set = set()
    for anno_exons in annotation_exons.values():
        for anno_exon in anno_exons:
            gene_exon_set.add(anno_exon)
    if not cluster_with_exons:
        junctions_clusters, _ = oracle_cluster_junctions(
            sub_reads_introns, None, min_count)
    else:
        junctions_clusters, _ = oracle_cluster_junctions(
            sub_reads_introns, sub_reads_exons, min_count)
    # reads with no exon overlapping any annotated gene exon are removed
    # AFTER clustering (:697-717); intervaltree query [es, ee+1)
    anno_ivs = [(s, e + 1) for (_, s, e) in gene_exon_set]
    reads_to_remove = []
    if dna_vcfs is not None:
        # filtering variant: drop reads whose PS has no DNA-backed variant
        # (:781-790)
        for qname in sub_reads_tags.keys():
            phase_set = sub_reads_tags[qname]["PS"]
            ps_variants = rna_vcfs.get(phase_set, []) if rna_vcfs else []
            overlapped_snps_cnt = 0
            for snp in ps_variants:
                ctg_pos = snp.split(":")[0] + ":" + snp.split(":")[1]
                if ctg_pos in dna_vcfs:
                    overlapped_snps_cnt += 1
            if overlapped_snps_cnt == 0:
                reads_to_remove.append(qname)
    for qname, read_exons in sub_reads_exons.items():
        overlapped = False
        for (exon_start, exon_end) in read_exons:
            if any(ivs < exon_end + 1 and ive > exon_start
                   for (ivs, ive) in anno_ivs):
                overlapped = True
                break
        if not overlapped:
            reads_to_remove.append(qname)
    for qname in set(reads_to_remove):
        del sub_reads_positions[qname]
        del sub_reads_exons[qname]
        del sub_reads_introns[qname]
        del sub_reads_tags[qname]
    events = []
    for junc_cluster in junctions_clusters:
        if len(junc_cluster) == 0:
            continue
        junction_set = f"{chrom}:{junc_cluster[0][0]}-{junc_cluster[0][1]}"
        for read_junc in junc_cluster:
            junction_start, junction_end, gt_ag_tag = read_junc
            novel = (chrom, junction_start, junction_end) not in gene_junction_set
            absences, presents = oracle_check_absent_present(
                junction_start, junction_end, sub_reads_positions,
                sub_reads_introns)
            test_result = oracle_haplotype_event_test(absences, presents,
                                                      sub_reads_tags)
            if test_result is None:
                continue
            (phase_set, h1_a, h1_p, h2_a, h2_p, pvalue, sor) = test_result
            events.append(dict(chr=chrom, start=junction_start,
                               end=junction_end, novel=novel,
                               gt_ag=gt_ag_tag, gene_name=gene_name,
                               strand=gene_strand,
                               junction_set=junction_set, ps=phase_set,
                               h1_a=h1_a, h1_p=h1_p, h2_a=h2_a, h2_p=h2_p,
                               p=pvalue, sor=sor))
    return events


HEADER = ("#Junction\tStrand\tJunction_set\tPhase_set\tHap1_absent\t"
          "Hap1_present\tHap2_absent\tHap2_present\tP_value\tSOR\t"
          "Novel\tGT_AG\tGene_name")


def oracle_analyze_asj(annotation_file, bam_path, reference_file,
                       min_count=10, gene_types=("protein_coding", "lncRNA"),
                       no_gtag=False, min_junctions=2,
                       cluster_with_exons=False, dna_vcf=None, rna_vcf=None):
    """Full pipeline -> (asj_tsv, asj_gene_tsv, gene_coverage_tsv) texts
    (:841-1049; genes in annotation order, PARITY.md #10)."""
    dna_vcfs = rna_vcfs = None
    if dna_vcf and rna_vcf:
        dna_vcfs = oracle_load_dna_vcf(dna_vcf)
        rna_vcfs = oracle_load_longcallR_phased_vcf(rna_vcf, with_dp_af=False)
    (anno_gene_regions, anno_gene_names, anno_gene_strands, anno_exon_regions,
     anno_intron_regions) = oracle_get_gene_regions(annotation_file,
                                                    set(gene_types))
    merged_genes_exons = oracle_merge_gene_exon_regions(anno_exon_regions)
    bam = BamFile(bam_path)
    fasta = FastaFile(reference_file)
    (read_assignment, reads_positions, reads_tags, reads_exons,
     reads_introns) = oracle_load_reads(bam, fasta, merged_genes_exons,
                                        no_gtag, min_junctions)
    gene_assigned_reads = defaultdict(list)
    for read_name, gene_id in read_assignment.items():
        gene_assigned_reads[gene_id].append(read_name)

    cov_lines = ["#Gene_name\tChr\tStart\tEnd\tNum_reads"]
    for gene_id, gene_region in anno_gene_regions.items():
        gene_coverage = len(gene_assigned_reads.get(gene_id, []))
        cov_lines.append(f"{anno_gene_names[gene_id]}\t{gene_region['chr']}\t"
                         f"{gene_region['start']}\t{gene_region['end']}\t"
                         f"{gene_coverage}")

    all_ase_events = {}
    for gene_id, gene_region in anno_gene_regions.items():
        if gene_region["chr"] not in fasta or \
                not gene_assigned_reads.get(gene_id):
            continue
        events = oracle_analyze_gene(
            anno_gene_names[gene_id], anno_gene_strands[gene_id],
            anno_exon_regions[gene_id], anno_intron_regions[gene_id],
            gene_region, gene_assigned_reads[gene_id], min_count,
            cluster_with_exons, reads_positions, reads_tags, reads_exons,
            reads_introns, dna_vcfs=dna_vcfs, rna_vcfs=rna_vcfs)
        for event in events:
            key = (event["chr"], event["start"], event["end"])
            all_ase_events.setdefault(key, {})[event["gene_name"]] = event

    junctions = [(key, g) for key in all_ase_events
                 for g in all_ase_events[key]]
    pass_idx, p_values = [], []
    for idx, (key, g) in enumerate(junctions):
        ev = all_ase_events[key][g]
        if ev["h1_a"] + ev["h1_p"] + ev["h2_a"] + ev["h2_p"] >= min_count:
            pass_idx.append(idx)
            p_values.append(ev["p"])
    adjusted = oracle_fdr_bh(p_values)
    asj_lines = [HEADER]
    asj_genes = {}
    for pi, idx in enumerate(pass_idx):
        key, g = junctions[idx]
        ev = all_ase_events[key][g]
        p = adjusted[pi]
        strand = ev["strand"]
        asj_lines.append(
            f"{ev['chr']}:{ev['start']}-{ev['end']}\t{strand}\t"
            f"{ev['junction_set']}\t{ev['ps']}\t{ev['h1_a']}\t{ev['h1_p']}\t"
            f"{ev['h2_a']}\t{ev['h2_p']}\t{p}\t{ev['sor']}\t{ev['novel']}\t"
            f"{ev['gt_ag']}\t{g}")
        if not no_gtag and not ev["gt_ag"]:
            continue
        if g not in asj_genes:
            asj_genes[g] = [ev["chr"], p, ev["sor"]]
        elif p < asj_genes[g][1]:
            asj_genes[g] = [ev["chr"], p, ev["sor"]]
    gene_lines = ["#Gene_name\tChr\tP_value\tSOR"]
    for gene_name in asj_genes:
        chrom, pvalue, sor = asj_genes[gene_name]
        gene_lines.append(f"{gene_name}\t{chrom}\t{pvalue}\t{sor}")
    return ("\n".join(asj_lines) + "\n", "\n".join(gene_lines) + "\n",
            "\n".join(cov_lines) + "\n")
