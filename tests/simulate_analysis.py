"""Random scenario generator for the ASE/ASJ analysis-layer differential
fuzz (production analysis/{ase,asj}.py vs tests/oracle_{ase,asj}.py).

Each scenario is one seeded draw of: a multi-gene (optionally multi-chrom)
annotation with transcript structure, gene_type/readthrough variation and
overlapping genes; a reference with planted canonical/non-canonical splice
signals and het SNVs; a phased BAM with spliced reads (M/N/D/I/S CIGARs),
HP/PS tag combinations, unmapped/secondary/duplicate-flag/supplementary
records and duplicate qnames (incl. a later junction-free record that must
delete earlier per-qname state — longcallR-asj.py:231-234); and RNA/DNA
VCFs for the --vcf1/--vcf2/--vcf3 ASE modes and the ASJ filtering mode.
"""

from collections import defaultdict

import numpy as np

from longcallr_tpu.io import bam as bamio
from longcallr_tpu.io.fasta import write_fasta

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_ref(rng, length):
    return BASES[rng.integers(0, 4, size=length)].copy()


def make_scenario(rng, tmpdir):
    """Build one scenario; returns a dict of paths + parameters."""
    n_chroms = int(rng.integers(1, 3))
    chroms = [f"chr{c}" for c in "AB"[:n_chroms]]
    L = {c: int(rng.integers(6000, 11000)) for c in chroms}
    refs = {c: _rand_ref(rng, L[c]) for c in chroms}

    # --- annotation -------------------------------------------------------
    genes = []          # (chrom, gid, gname, gtype, tag, strand, transcripts)
    gidx = 0
    for chrom in chroms:
        for _ in range(int(rng.integers(1, 5))):
            gidx += 1
            gid = f"G{gidx:03d}"
            gname = f"GENE{gidx:03d}" if rng.random() > 0.1 else None
            gtype = str(rng.choice(["protein_coding", "lncRNA",
                                    "pseudogene"], p=[0.7, 0.2, 0.1]))
            tag = "readthrough_transcript" if rng.random() < 0.07 else ""
            strand = "+" if rng.random() < 0.5 else "-"
            span = int(rng.integers(2500, 5200))
            start = int(rng.integers(1, max(2, L[chrom] - span - 10)))
            transcripts = []
            for t in range(int(rng.integers(1, 4))):
                n_ex = int(rng.integers(1, 5))
                bounds = np.sort(rng.choice(
                    np.arange(start + 1, start + span - 1), size=2 * n_ex,
                    replace=False))
                exons = [(int(bounds[2 * k]), int(bounds[2 * k + 1]))
                         for k in range(n_ex)
                         if bounds[2 * k] < bounds[2 * k + 1]]
                if exons:
                    transcripts.append((f"{gid}.t{t}", exons))
            if transcripts:
                genes.append((chrom, gid, gname, gtype, tag, strand,
                              transcripts))
    # occasionally a multi-chrom gene (must be skipped by exon merging)
    if n_chroms == 2 and rng.random() < 0.2 and genes:
        chrom, gid, gname, gtype, tag, strand, transcripts = genes[0]
        other = chroms[1] if chrom == chroms[0] else chroms[0]
        tid, exons = transcripts[0]
        extra = [(other, gid, gname, gtype, tag, strand,
                  [(tid + "x", [(100, 500)])])]
        genes += extra

    gff3 = rng.random() < 0.3
    anno_path = f"{tmpdir}/anno." + ("gff3" if gff3 else "gtf")
    with open(anno_path, "w") as f:
        f.write("#comment line\n")
        for chrom, gid, gname, gtype, tag, strand, transcripts in genes:
            span_s = min(s for _, exons in transcripts for (s, e) in exons)
            span_e = max(e for _, exons in transcripts for (s, e) in exons)
            if gff3:
                attrs = f"gene_id={gid};gene_type={gtype}"
                if gname:
                    attrs += f";gene_name={gname}"
                if tag:
                    attrs += f";tag={tag}"
            else:
                attrs = f'gene_id "{gid}"; gene_type "{gtype}";'
                if gname:
                    attrs += f' gene_name "{gname}";'
                if tag:
                    attrs += f' tag "{tag}";'
            f.write(f"{chrom}\tsim\tgene\t{span_s}\t{span_e}\t.\t{strand}"
                    f"\t.\t{attrs}\n")
            for tid, exons in transcripts:
                if gff3:
                    ta = attrs + f";transcript_id={tid}"
                else:
                    ta = attrs + f' transcript_id "{tid}";'
                for (es, ee) in exons:
                    f.write(f"{chrom}\tsim\texon\t{es}\t{ee}\t.\t{strand}"
                            f"\t.\t{ta}\n")

    # --- haplotypes: plant het SNVs inside gene spans ---------------------
    het_sites = defaultdict(dict)       # chrom -> pos0 -> (ref, alt)
    for chrom in chroms:
        n_het = int(rng.integers(3, 10))
        for _ in range(n_het):
            p = int(rng.integers(200, L[chrom] - 200))
            refb = int(refs[chrom][p])
            altb = int(BASES[(int(np.where(BASES == refb)[0][0])
                              + int(rng.integers(1, 4))) % 4])
            het_sites[chrom][p] = (refb, altb)
    haps = {}
    for chrom in chroms:
        h1 = refs[chrom].copy()
        h2 = refs[chrom].copy()
        for p, (r, a) in het_sites[chrom].items():
            h1[p] = a               # hap1 carries ALT everywhere
        haps[chrom] = {1: h1, 2: h2}

    # plant canonical splice signals at some candidate junction sites
    junction_menu = defaultdict(list)   # chrom -> (istart0, ilen, canonical)
    for chrom in chroms:
        for _ in range(int(rng.integers(2, 7))):
            ilen = int(rng.integers(80, 600))
            istart = int(rng.integers(300, L[chrom] - ilen - 300))
            canonical = rng.random() < 0.7
            if canonical:
                sig_l, sig_r = (b"GT", b"AG") if rng.random() < 0.8 \
                    else (b"CT", b"AC")
                for h in (refs[chrom], haps[chrom][1], haps[chrom][2]):
                    h[istart:istart + 2] = np.frombuffer(sig_l, np.uint8)
                    h[istart + ilen - 2:istart + ilen] = \
                        np.frombuffer(sig_r, np.uint8)
            junction_menu[chrom].append((istart, ilen, canonical))

    # --- reads -------------------------------------------------------------
    ps_menu = {c: [int(x) for x in
                   rng.integers(1, 9000, size=int(rng.integers(1, 3)))]
               for c in chroms}
    rows = []       # (chrom_idx, pos, qname, flag, cigar_items, seq, tags)
    qn = 0

    def build_read(chrom, hap, start, segments, rng):
        """segments: list of ("M"|"N"|"D"|"I"|"S", ln). Returns cigar+seq."""
        items = []
        seq = []
        rpos = start
        for op, ln in segments:
            items.append((ln, op))
            if op == "M":
                seq.append(haps[chrom][hap][rpos:rpos + ln])
                rpos += ln
            elif op in ("N", "D"):
                rpos += ln
            elif op in ("I", "S"):
                seq.append(BASES[rng.integers(0, 4, size=ln)])
        return items, np.concatenate(seq) if seq else np.zeros(0, np.uint8)

    for ci, chrom in enumerate(chroms):
        n_reads = int(rng.integers(25, 90))
        for _ in range(n_reads):
            qn += 1
            qname = f"r{qn:05d}"
            hap = int(rng.integers(1, 3))
            start = int(rng.integers(0, L[chrom] - 2500))
            # read structure: leading S?, alternating M / (N|D|I) segments
            segs = []
            if rng.random() < 0.2:
                segs.append(("S", int(rng.integers(5, 40))))
            n_junc = int(rng.integers(0, 4))
            rpos = start
            segs.append(("M", int(rng.integers(150, 900))))
            for _ in range(n_junc):
                r = rng.random()
                if r < 0.55 and junction_menu[chrom]:
                    # use a menu junction if one starts ahead; else random N
                    k = int(rng.integers(0, len(junction_menu[chrom])))
                    istart, ilen, _ = junction_menu[chrom][k]
                    # align the running M segment to end at istart
                    consumed = sum(l for (o, l) in segs if o in "MND")
                    cur = start + consumed
                    if cur < istart - 10 and istart + ilen < L[chrom] - 400:
                        # extend the last M to reach istart exactly
                        lastop, lastln = segs[-1]
                        if lastop == "M":
                            segs[-1] = ("M", lastln + (istart - cur))
                        else:
                            segs.append(("M", istart - cur))
                        segs.append(("N", ilen))
                        segs.append(("M", int(rng.integers(120, 700))))
                        continue
                op = str(rng.choice(["N", "D", "I"], p=[0.6, 0.25, 0.15]))
                ln = int(rng.integers(60, 400)) if op == "N" else \
                    int(rng.integers(1, 12))
                segs.append((op, ln))
                segs.append(("M", int(rng.integers(120, 700))))
            if rng.random() < 0.15:
                segs.append(("S", int(rng.integers(5, 40))))
            # clamp to contig
            ref_len = sum(l for (o, l) in segs if o in "MND")
            if start + ref_len >= L[chrom] - 1:
                continue
            cigar_items, seq = build_read(chrom, hap, start, segs, rng)
            if not len(seq):
                continue
            # tags: HP/PS combinations
            tags = b""
            r = rng.random()
            ps = int(rng.choice(ps_menu[chrom]))
            if r < 0.72:
                tags = (bamio.make_tag_bytes("HP", "i", hap)
                        + bamio.make_tag_bytes("PS", "i", ps))
            elif r < 0.82:
                tags = bamio.make_tag_bytes("HP", "i", hap)   # HP, no PS
            elif r < 0.9:
                tags = bamio.make_tag_bytes("PS", "i", ps)    # PS, no HP
            flag = 0
            fr = rng.random()
            if fr < 0.04:
                flag |= 0x100                                  # secondary
            elif fr < 0.07:
                flag |= 0x400                                  # duplicate
            elif fr < 0.09:
                flag |= 0x800                                  # supplementary
            rows.append((ci, start, qname, flag,
                         bamio.encode_cigar(cigar_items), seq, tags))
        # duplicate-qname pair: spliced early record + junction-free late one
        if rng.random() < 0.5 and rows:
            qname = f"dup{ci}"
            items, seq = build_read(chrom, 1, 200,
                                    [("M", 300), ("N", 200), ("M", 300)], rng)
            rows.append((ci, 200, qname, 0, bamio.encode_cigar(items), seq,
                         bamio.make_tag_bytes("HP", "i", 1)
                         + bamio.make_tag_bytes("PS", "i",
                                                int(ps_menu[chrom][0]))))
            late = int(L[chrom] - 900)
            items, seq = build_read(chrom, 2, late, [("M", 400)], rng)
            rows.append((ci, late, qname, 0, bamio.encode_cigar(items), seq,
                         bamio.make_tag_bytes("HP", "i", 2)))

    rows.sort(key=lambda t: (t[0], t[1]))
    bam_path = f"{tmpdir}/sc.bam"
    with bamio.BamWriter(bam_path, chroms, [L[c] for c in chroms]) as w:
        for ci, pos, qname, flag, cigar, seq, tags in rows:
            w.write_record(qname=qname, flag=flag, ref_id=ci, pos=pos,
                           mapq=60, cigar=cigar, seq=bytes(seq),
                           qual=np.full(len(seq), 30, np.uint8), tags=tags)
    fa_path = f"{tmpdir}/sc.fa"
    write_fasta(fa_path, {c: bytes(refs[c]) for c in chroms})

    # --- VCFs ---------------------------------------------------------------
    vcf_hdr = ("##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
               "FILTER\tINFO\tFORMAT\tS\n")

    def _emit_site(f, chrom, p, refb, altb, gt, filt="PASS", fmt_extra=None):
        fmt = "GT"
        sample = gt
        if fmt_extra:
            fmt += ":" + ":".join(k for k, _ in fmt_extra)
            sample += ":" + ":".join(v for _, v in fmt_extra)
        f.write(f"{chrom}\t{p + 1}\t.\t{chr(refb)}\t{chr(altb)}\t60\t"
                f"{filt}\t.\t{fmt}\t{sample}\n")

    rna_vcf = f"{tmpdir}/rna.vcf"         # vcf1: longcallR-style phased
    with open(rna_vcf, "w") as f:
        f.write(vcf_hdr)
        for chrom in chroms:
            for p in sorted(het_sites[chrom]):
                refb, altb = het_sites[chrom][p]
                r = rng.random()
                ps = int(rng.choice(ps_menu[chrom]))
                dp = int(rng.integers(0, 60))
                af = round(float(rng.random()), 2)
                extra = [("GQ", "30"), ("PS", str(ps)), ("DP", str(dp)),
                         ("AF", f"{af}")]
                if r < 0.6:
                    gt = "0|1" if rng.random() < 0.5 else "1|0"
                    _emit_site(f, chrom, p, refb, altb, gt, "PASS", extra)
                elif r < 0.75:
                    _emit_site(f, chrom, p, refb, altb, "0/1", "PASS", extra)
                elif r < 0.85:
                    _emit_site(f, chrom, p, refb, altb, "0|1", "dn", extra)
                else:       # indel-shaped: skipped by all loaders
                    f.write(f"{chrom}\t{p + 1}\t.\t{chr(refb)}A\t{chr(altb)}"
                            f"\t60\tPASS\t.\tGT:PS:DP:AF\t0|1:{ps}:{dp}:"
                            f"{af}\n")

    dna_phased_vcf = f"{tmpdir}/dna_phased.vcf"    # vcf2
    dna_vcf = f"{tmpdir}/dna.vcf"                  # vcf3
    with open(dna_phased_vcf, "w") as f2, open(dna_vcf, "w") as f3:
        f2.write(vcf_hdr)
        f3.write(vcf_hdr)
        for chrom in chroms:
            for p in sorted(het_sites[chrom]):
                refb, altb = het_sites[chrom][p]
                if rng.random() < 0.8:
                    gt = "0|1" if rng.random() < 0.5 else "1|0"
                    _emit_site(f2, chrom, p, refb, altb, gt)
                if rng.random() < 0.8:
                    gt = str(rng.choice(["0/1", "0|1", "1|0", "1/1"]))
                    _emit_site(f3, chrom, p, refb, altb, gt)

    return dict(anno=anno_path, bam=bam_path, fa=fa_path, rna_vcf=rna_vcf,
                dna_phased_vcf=dna_phased_vcf, dna_vcf=dna_vcf,
                chroms=chroms)
