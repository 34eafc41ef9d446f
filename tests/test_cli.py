"""CLI smoke tests: preset resolution, --get-blocks, full run."""

import numpy as np

from longcallr_tpu.cli import build_parser, config_from_args, main

from simulate import make_reference, plant_snps, simulate_bam


def test_preset_resolution():
    args = build_parser().parse_args(
        ["-b", "x.bam", "-f", "x.fa", "-o", "out", "-p", "ont-cdna",
         "--min-depth", "20"])
    cfg = config_from_args(args)
    assert cfg.platform == "ont"
    assert cfg.min_depth == 20          # explicit override wins
    assert cfg.min_phase_score == 13.0  # preset default
    assert cfg.strand_bias is True


def test_cli_get_blocks_and_run(tmp_path, rng, capsys):
    ref = make_reference(rng, 5000)
    truth = plant_snps(rng, ref, n_het=5, n_hom=1)
    bam_path = str(tmp_path / "c.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=40, read_len=2500,
                 err_rate=0.01)
    fa = bam_path.replace(".bam", ".fa")
    rc = main(["-b", bam_path, "-f", fa, "-o", str(tmp_path / "o"),
               "-p", "hifi-masseq", "--min-read-length", "100",
               "--get-blocks"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "chrS:" in out
    rc = main(["-b", bam_path, "-f", fa, "-o", str(tmp_path / "o"),
               "-p", "hifi-masseq", "--min-read-length", "100"])
    assert rc == 0
    assert (tmp_path / "o.vcf").exists()
    assert (tmp_path / "o.phased.bam").exists()


def test_cli_config_resolution():
    """Flag → CallerConfig resolution: presets, overrides, tri-states."""
    from longcallr_tpu.cli import build_parser, config_from_args

    parse = lambda extra: build_parser().parse_args(
        ["-b", "x.bam", "-f", "x.fa", "-o", "out", "-p", "ont-cdna"] + extra)
    a = parse([])
    cfg = config_from_args(a)
    assert cfg.min_depth == 10 and cfg.min_phase_score == 13.0
    assert cfg.strand_bias is True and cfg.is_ont
    assert a.batched is None                     # auto (multi-region only)
    assert cfg.somatic is False

    a2 = parse(["--somatic", "--somatic-purity", "0.42", "-t", "7",
                "--min-depth", "3", "--no-batched",
                "--bam-compression-level", "1"])
    cfg2 = config_from_args(a2)
    assert cfg2.somatic and abs(cfg2.somatic_purity - 0.42) < 1e-12
    assert cfg2.threads == 7 and cfg2.min_depth == 3
    assert cfg2.bam_compression_level == 1
    assert a2.batched is False

    a3 = parse(["--batched"])
    assert a3.batched is True


def test_cli_profile_dir_and_index_output(tmp_path, rng):
    """--profile-dir writes a jax.profiler trace; --index-output writes a
    .bai for the phased BAM."""
    import os

    ref = make_reference(rng, 5000)
    truth = plant_snps(rng, ref, n_het=5, n_hom=1)
    bam_path = str(tmp_path / "p.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=40, read_len=2500,
                 err_rate=0.01)
    fa = bam_path.replace(".bam", ".fa")
    prof = str(tmp_path / "trace")
    rc = main(["-b", bam_path, "-f", fa, "-o", str(tmp_path / "o"),
               "-p", "hifi-masseq", "--min-read-length", "100",
               "--profile-dir", prof, "--index-output"])
    assert rc == 0
    dumped = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert dumped, "profiler trace directory is empty"
    assert (tmp_path / "o.phased.bam.bai").exists()
    # the written index is loadable and covers the contig
    from longcallr_tpu.io.bai import BaiIndex
    idx = BaiIndex.load(str(tmp_path / "o.phased.bam.bai"))
    assert len(idx.bins) >= 1


def test_cli_auto_stream(tmp_path, rng, monkeypatch, caplog):
    """AUTO stream: an indexed BAM above LONGCALLR_STREAM_AUTO_MB runs the
    streaming pipeline by default; --no-stream forces resident. Outputs are
    byte-identical either way (tests/test_stream_genome.py)."""
    from longcallr_tpu.io.bai import build_bai

    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref, n_het=6, n_hom=1, min_gap=700)
    bam_path = str(tmp_path / "auto.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=50, read_len=2500,
                 err_rate=0.01)
    build_bai(bam_path)
    fa = bam_path.replace(".bam", ".fa")
    monkeypatch.setenv("LONGCALLR_STREAM_AUTO_MB", "0.001")
    import logging
    with caplog.at_level(logging.INFO):
        rc = main(["-b", bam_path, "-f", fa, "-o", str(tmp_path / "s"),
                   "-p", "hifi-masseq", "--min-read-length", "100"])
    assert rc == 0
    assert any("using --stream" in r.message for r in caplog.records)
    rc = main(["-b", bam_path, "-f", fa, "-o", str(tmp_path / "r"),
               "-p", "hifi-masseq", "--min-read-length", "100",
               "--no-stream"])
    assert rc == 0
    with open(str(tmp_path / "s.vcf")) as f1, open(str(tmp_path / "r.vcf")) as f2:
        assert f1.read() == f2.read()
    # without a .bai the auto heuristic stays resident
    import os as _os
    _os.remove(bam_path + ".bai")
    rc = main(["-b", bam_path, "-f", fa, "-o", str(tmp_path / "r2"),
               "-p", "hifi-masseq", "--min-read-length", "100"])
    assert rc == 0
