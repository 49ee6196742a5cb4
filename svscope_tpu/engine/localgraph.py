"""localGraph driver: run the per-window somatic decision over a stream of
candidate windows, batched for TPU.

Replaces reference src/SVscope.py:118-183 (a 6-process multiprocessing pool
draining async results into Raw.bed in completion order, then shell-sorting)
with a three-phase pipeline:

  A (host)   DataMaker + POA MSA + feature selection per window
  B (device) batched EM over all windows of a chunk (em_cluster_batch:
             bucketed vmap over windows x K x EM-scan)
  C (host)   cluster labeling, consensus POA, record emission

Resume (--Continue, src/SVscope.py:142-151) is generalized to a correct
journal: finished window keys (chrom:start-end) are re-read from the
existing Raw.bed and skipped.  (The reference's resume membership test
compares split fields against joined strings and never matches —
src/SVscope.py:150 — so it reruns and appends duplicates; downstream
drop_duplicates papers over it.  We resume correctly.)

Output: '<T>.vs.<N>.TandemRepeat.Raw.bed', 10 columns, sorted by
(chrom, start) like the reference's `sort -k1,1 -k2,2n`.
"""
from __future__ import annotations

import logging
import os
import time

import numpy as np

from ..io.bam import BamReader
from ..io.fasta import FastaFile
from ..models.mixture import em_cluster_batch
from ..ops.poa import poa
from ..utils import seq as sq
from .datamaker import WindowData, data_maker, data_maker2
from .decision import decision, msa_feature_selection, tdscope

log = logging.getLogger("svscope_tpu.localgraph")


def raw_bed_name(t_ids: list[str], n_ids: list[str]) -> str:
    return "%s.vs.%s.TandemRepeat.Raw.bed" % ("-".join(t_ids), "-".join(n_ids))


def _emit_record(win: WindowData, em_result, enc, read_ids,
                 t_label="tumor", readcutoff=3) -> list:
    """Phase C for one window given its EM result (labels etc.)."""
    parts = win.record.strip().split("\t")
    chrom, start, end = parts[0], parts[1], parts[2]
    record = [chrom, start, end, "-", "-", 0, "-", "-", 0, win.flag]
    if em_result is None:
        return record
    K, _, labels, theta, gamma, pi, bics = em_result
    tags = np.array([x.split("|")[0].split("_")[-1] for x in read_ids])
    som_idx, germ_idx = [], []
    for L in np.unique(labels):
        members = np.flatnonzero(labels == L)
        mtags = np.unique(tags[members])
        if mtags.shape[0] == 1 and mtags[0] == t_label and members.size >= readcutoff:
            som_idx.append(members)
        elif members.size >= readcutoff:
            germ_idx.append(members)
    som_seqs, germ_seqs = [], []
    for idx in som_idx:
        rows = [sq.decode(enc[i + 1]) for i in idx]
        som_seqs.append(poa(rows, 1)[0] if max(map(len, rows)) > 0 else "-")
    for idx in germ_idx:
        rows = [sq.decode(enc[i + 1]) for i in idx]
        germ_seqs.append(poa(rows, 1)[0] if max(map(len, rows)) > 0 else "-")
    if som_seqs and germ_idx:
        record = [chrom, start, end,
                  ";".join(som_seqs),
                  ";".join(",".join(read_ids[i] for i in idx) for idx in som_idx),
                  len(som_seqs),
                  ";".join(germ_seqs),
                  ";".join(",".join(read_ids[i] for i in idx) for idx in germ_idx),
                  len(germ_seqs),
                  win.flag + "|EMOutput"]
    return record


def run_local_graph(window_records: list[str], reference: str,
                    tumor_bams: list[str], normal_bams: list[str],
                    t_ids: list[str], n_ids: list[str], savedir: str,
                    offset: int = 50, mapq: int = 5, batch_size: int = 64,
                    continue_run: bool = False, em_dtype=None,
                    t_label: str = "tumor", readcutoff: int = 3,
                    hcutoff: int = 3, scutoff: float = 0.05) -> str:
    """Batched localGraph (src/SVscope.py:118-183 equivalent)."""
    os.makedirs(savedir, exist_ok=True)
    out_path = os.path.join(savedir, raw_bed_name(t_ids, n_ids))
    done: set[str] = set()
    existing: list[str] = []
    if continue_run and os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                if line.strip():
                    existing.append(line.rstrip("\n"))
                    done.add(":".join(line.split("\t")[0:3]))
    todo = [r for r in window_records
            if ":".join(r.strip().split("\t")[0:3]) not in done]
    log.info("localGraph: %d windows (%d resumed)", len(todo), len(done))

    ref = FastaFile(reference)
    readers = [BamReader(p) for p in tumor_bams + normal_bams]
    labels = [f"{t}_tumor" for t in t_ids] + [f"{n}_normal" for n in n_ids]
    rows: list[list] = []
    t0 = time.time()
    for off in range(0, len(todo), batch_size):
        chunk = todo[off:off + batch_size]
        # Phase A: extract + MSA + feature-select on host
        ready = []       # (win, enc, read_ids, feat)
        for rec in chunk:
            win = data_maker(rec, ref, readers, labels, offset=offset, mapq=mapq)
            parts = rec.strip().split("\t")
            svtype = parts[3].split(",")[0] if len(parts) > 3 else ""
            prep = _prepare_decision(win, hcutoff, scutoff, t_label)
            if prep is None and svtype == "DUP":
                # DUP corner rescue (src/SomTDDetector.py:41-58) via the
                # sequential path; dormant in the production flow
                make_data = lambda r: win
                make_data2 = lambda r: data_maker2(r, ref, readers, labels,
                                                   offset=offset, mapq=mapq)
                decide = lambda w: decision(w, t_label, readcutoff, hcutoff,
                                            scutoff, em_dtype=em_dtype)
                rows.append(tdscope(rec, make_data, make_data2, decide))
                continue
            ready.append((win, prep))
        # Phase B: batched EM on device
        feats = [p[3] for (w, p) in ready if p is not None]
        kwargs = {} if em_dtype is None else {"dtype": em_dtype}
        em_results = iter(em_cluster_batch(feats, **kwargs) if feats else [])
        # Phase C: emit
        for win, prep in ready:
            if prep is None:
                parts = win.record.strip().split("\t")
                rows.append([parts[0], parts[1], parts[2],
                             "-", "-", 0, "-", "-", 0, win.flag])
            else:
                enc, feat, read_ids, _ = prep[0], prep[3], prep[2], None
                rows.append(_emit_record(win, next(em_results), prep[0],
                                         prep[2], t_label, readcutoff))
        log.info("localGraph: %d/%d windows, %.1fs", off + len(chunk),
                 len(todo), time.time() - t0)
    out_rows = existing + ["\t".join(str(x) for x in r) for r in rows]
    out_rows.sort(key=lambda l: (l.split("\t")[0], int(l.split("\t")[1])))
    with open(out_path, "w") as f:
        for line in out_rows:
            f.write(line + "\n")
    log.info("localGraph: finished %d windows in %.1f s", len(todo),
             time.time() - t0)
    return out_path


def _prepare_decision(win: WindowData, hcutoff, scutoff, t_label):
    """Phase-A part of Decision: gates + MSA + feature selection.

    Returns (enc, feat_sel, read_ids, feat) or None when the window fails a
    gate (base record should be emitted with its flag)."""
    tags = np.array([x.split("|")[0].split("_")[-1] for x in win.read_ids])
    uniq, cnt = (np.unique(tags, return_counts=True) if tags.size
                 else (np.array([]), np.array([])))
    if not (len(win.sequences) > 3 and uniq.shape[0] >= 2 and cnt.min() >= 3):
        return None
    enc, feat, read_ids = msa_feature_selection(
        win.sequences, win.flank_5, win.flank_3, win.read_ids,
        hcutoff=hcutoff, scutoff=scutoff)
    if feat.shape[0] == 0 or feat.shape[1] < 10:
        return None
    return (enc, None, read_ids, feat)
