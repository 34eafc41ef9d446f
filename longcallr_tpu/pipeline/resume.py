"""Region-granular checkpoint/resume.

The reference has no resume story (SURVEY.md §5: a crash restarts the whole
run). Here every region is an idempotent work unit, so completed region
results are appended to a JSONL sidecar; on restart, completed regions are
loaded instead of recomputed. Outputs are tiny relative to compute, so this
is nearly free.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Iterator, Optional, TextIO

from .engine import RegionResult
from ..tiles.regions import Region


class RegionCheckpoint:
    """Append-only JSONL store of RegionResults keyed by region string."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._done: Dict[str, RegionResult] = {}
        self._f: Optional[TextIO] = None
        self._lock = threading.Lock()
        if path and os.path.exists(path):
            with open(path) as f:
                for line in f:
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail write from a crash
                    reg = Region(chr=d["chr"], start=d["start"], end=d["end"],
                                 gene_id=d.get("gene_id"))
                    self._done[str(reg)] = RegionResult(
                        region=reg, vcf_lines=d["vcf_lines"],
                        read_assignments=d["read_assignments"],
                        phase_sets=d["phase_sets"],
                        n_fragments=d["n_fragments"],
                        n_candidates=d["n_candidates"])
        if path:
            self._f = open(path, "a")

    @property
    def n_done(self) -> int:
        return len(self._done)

    def get(self, region: Region) -> Optional[RegionResult]:
        return self._done.get(str(region))

    def put(self, res: RegionResult) -> None:
        if self._f is None:
            return
        d = dict(chr=res.region.chr, start=res.region.start,
                 end=res.region.end, gene_id=res.region.gene_id,
                 vcf_lines=res.vcf_lines,
                 read_assignments=res.read_assignments,
                 phase_sets=res.phase_sets, n_fragments=res.n_fragments,
                 n_candidates=res.n_candidates)
        line = json.dumps(d) + "\n"
        with self._lock:  # put() is called from worker threads
            self._f.write(line)
            self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None
