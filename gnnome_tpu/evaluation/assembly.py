"""Assembly reconstruction + quality metrics.

Reference: ``evaluate.py``. Contig algebra (``evaluate.py:36-47``): the
sequence of a walk is the concatenation of per-edge prefixes
``read[src][:prefix_length]`` plus the final read in full; N50/NG50 and
reconstructed-fraction metrics as ``evaluate.py:58-104``.
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

# CHM13 v1.1 chromosome lengths (evaluate.py:9-33 == pipeline.py:19-43)
CHR_LENS = {
    "chr1": 248387328, "chr2": 242696752, "chr3": 201105948,
    "chr4": 193574945, "chr5": 182045439, "chr6": 172126628,
    "chr7": 160567428, "chr8": 146259331, "chr9": 150617247,
    "chr10": 134758134, "chr11": 135127769, "chr12": 133324548,
    "chr13": 113566686, "chr14": 101161492, "chr15": 99753195,
    "chr16": 96330374, "chr17": 84276897, "chr18": 80542538,
    "chr19": 61707364, "chr20": 66210255, "chr21": 45090682,
    "chr22": 51324926, "chrX": 154259566,
}


def walk_to_sequence(
    walks: List[List[int]],
    reads: Sequence[str],
    prefix_length: np.ndarray,
    edges: Dict[Tuple[int, int], int],
) -> List[Tuple[str, str]]:
    """Walks → (contig_id_header, sequence) pairs (``evaluate.py:36-47``)."""
    contigs = []
    for i, walk in enumerate(walks):
        parts = []
        for src, dst in zip(walk[:-1], walk[1:]):
            prefix = int(prefix_length[edges[(src, dst)]])
            parts.append(reads[src][:prefix])
        parts.append(reads[walk[-1]])
        seq = "".join(parts)
        contigs.append((f"contig_{i+1} length={len(seq)}", seq))
    return contigs


def save_assembly(
    contigs: List[Tuple[str, str]], data_path: str, idx: int,
    suffix: str = "", dir_name: str = "assembly",
) -> str:
    """FASTA output (``evaluate.py:50-55``)."""
    assembly_dir = os.path.join(data_path, dir_name)
    os.makedirs(assembly_dir, exist_ok=True)
    path = os.path.join(assembly_dir, f"{idx}_assembly{suffix}.fasta")
    with open(path, "w") as f:
        for header, seq in contigs:
            f.write(f">{header}\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")
    return path


def calculate_n50(lengths: Sequence[int]) -> int:
    """N50 (``evaluate.py:58-73``)."""
    lengths = sorted(lengths, reverse=True)
    total = sum(lengths)
    acc = 0
    for l in lengths:
        acc += l
        if acc >= total / 2:
            return l
    return -1


def calculate_ng50(lengths: Sequence[int], ref_length: int) -> int:
    """NG50 against the reference length (``evaluate.py:76-92``)."""
    if ref_length <= 0:
        return -1
    acc = 0
    for l in sorted(lengths, reverse=True):
        acc += l
        if acc >= ref_length / 2:
            return l
    return -1


def quick_evaluation(
    contigs: List[Tuple[str, str]], chr_n: str, ref_length: int | None = None
) -> Tuple[int, int, float, int, int]:
    """(num_contigs, longest, reconstructed_frac, N50, NG50)
    (``evaluate.py:95-104``)."""
    if ref_length is None:
        ref_length = CHR_LENS.get(chr_n, 0)
    lengths = [len(seq) for _, seq in contigs]
    if not lengths:
        return 0, 0, 0.0, -1, -1
    return (
        len(contigs),
        max(lengths),
        sum(lengths) / ref_length if ref_length else 0.0,
        calculate_n50(lengths),
        calculate_ng50(lengths, ref_length),
    )


def print_summary(
    data_path: str, idx: int, chr_n: str,
    num_contigs: int, longest: int, reconstructed: float, n50: int, ng50: int,
    log_fn=print,
) -> str:
    """Per-graph text report (``evaluate.py:112-124``)."""
    reports_dir = os.path.join(data_path, "reports")
    os.makedirs(reports_dir, exist_ok=True)
    path = os.path.join(reports_dir, f"{idx}_report.txt")
    lines = [
        "-" * 80,
        f"Report for graph {idx} in {data_path}",
        f"Graph created from {chr_n}",
        f"Num contigs:\t{num_contigs}",
        f"Longest contig:\t{longest}",
        f"Reconstructed:\t{reconstructed * 100:2f}%",
        f"N50:\t{n50}",
        f"NG50:\t{ng50}",
    ]
    with open(path, "w") as f:
        for line in lines:
            log_fn(line)
            f.write(line + "\n")
    return path
