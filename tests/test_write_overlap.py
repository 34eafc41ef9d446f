"""Overlapped resident-path phased-BAM write (VERDICT r4 item 2).

The batched ``run()`` path deflates each wave's phased records on an ordered
background writer while later waves compute (pipeline/caller.py::
_ResidentWriteOverlap). The output must be byte-identical to the strictly
serial end-of-run write (the reference's serial third pass,
thread.rs:307-361), including when

- waves are split small so several wave_done merges interleave with writes,
- the same qname occurs in more than one region (the first-wins hazard:
  a record's HP/PS can be determined by a *later* region's assignment map,
  so the writer must queue that region until the merge frontier passes the
  qname's last possible contributor).
"""

import os
import unittest.mock as mock

import numpy as np

from longcallr_tpu.config import preset
from longcallr_tpu.io.bam import BamFile, BamWriter
from longcallr_tpu.pipeline.caller import run
from longcallr_tpu.utils.bench_workload import make_genome_workload


def _run_pair(bam_path, fa_path, tmp_path, cfg, wave_cells=None):
    env_on = {"LONGCALLR_RESIDENT_WRITE_OVERLAP": "1"}
    env_off = {"LONGCALLR_RESIDENT_WRITE_OVERLAP": "0"}
    if wave_cells is not None:
        env_on["LONGCALLR_WAVE_CELLS"] = str(wave_cells)
        env_off["LONGCALLR_WAVE_CELLS"] = str(wave_cells)
    with mock.patch.dict(os.environ, env_on):
        o_ov = run(bam_path, fa_path, str(tmp_path / "ov"), cfg, batched=True)
    with mock.patch.dict(os.environ, env_off):
        o_ser = run(bam_path, fa_path, str(tmp_path / "ser"), cfg,
                    batched=True)
    with open(o_ov.vcf_path) as a, open(o_ser.vcf_path) as b:
        assert a.read() == b.read()
    with open(o_ov.phased_bam_path, "rb") as a, \
            open(o_ser.phased_bam_path, "rb") as b:
        assert a.read() == b.read()
    assert o_ov.n_reads_tagged == o_ser.n_reads_tagged > 0
    return o_ov


def test_overlap_write_multi_wave_byte_identical(tmp_path):
    """Multi-contig workload forced into many small waves: overlapped and
    serial writes produce identical BGZF bytes (container framing included)."""
    bam_path = str(tmp_path / "g.bam")
    fa_path = str(tmp_path / "g.fa")
    make_genome_workload(bam_path, fa_path, contigs=[
        ("chrA", [(12_000, 40, 120), (8_000, 50, 150)]),
        ("chrB", [(10_000, 60, 130), (6_000, 40, 120)]),
    ])
    cfg = preset("hifi-masseq").replace(threads=2)
    # tiny wave budget → one region per wave → maximal write/compute overlap
    _run_pair(bam_path, fa_path, tmp_path, cfg, wave_cells=1)


def test_overlap_write_duplicate_qnames_hazard(tmp_path):
    """Same qname planted in regions on two contigs: the chrA region's
    records can be tagged by chrB's first-wins map entries, so the writer
    must hold chrA until chrB's maps merge. Bytes must still match the
    serial write exactly."""
    bam_path = str(tmp_path / "g.bam")
    fa_path = str(tmp_path / "g.fa")
    make_genome_workload(bam_path, fa_path, contigs=[
        ("chrA", [(10_000, 40, 120)]),
        ("chrB", [(10_000, 40, 120)]),
    ])
    src = BamFile(bam_path)
    # rename 8 chrB records' qnames to 8 chrA qnames (same byte length —
    # the simulator's names are fixed-width), creating cross-region
    # duplicates the way supplementary/mate records share names
    tb = src._ref_index["chrB"]
    ta = src._ref_index["chrA"]
    idx_b = np.nonzero(src.ref_id == tb)[0][:8]
    idx_a = np.nonzero(src.ref_id == ta)[0][:8]
    qn_a = src.qnames_at(idx_a)
    buf = bytearray(src._buf)
    for ridx, new_q in zip(idx_b, qn_a):
        off = int(src.rec_off[ridx])
        n = int(src.l_read_name[ridx])
        nb = new_q.encode() + b"\x00"
        assert len(nb) == n
        buf[off + 32:off + 32 + n] = nb
    hacked = str(tmp_path / "dup.bam")
    with BamWriter(hacked, src.references, src.lengths,
                   header_text=src.header_text) as w:
        for i in range(src.n_records):
            w.write_raw(bytes(buf[int(src.rec_off[i]):int(src.rec_end[i])]))
    # sanity: the duplicate names really exist on both contigs now
    chk = BamFile(hacked)
    assert set(chk.qnames_at(idx_b)) == set(qn_a)

    cfg = preset("hifi-masseq").replace(threads=2)
    _run_pair(hacked, fa_path, tmp_path, cfg, wave_cells=1)
