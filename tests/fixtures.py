"""Deterministic synthetic genome fixtures (SURVEY.md §4: no real RefSeq data
on this machine — generate random ACGT FASTA/FASTQ, optionally gzipped)."""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng: np.random.Generator, length: int, n_prob: float = 0.0) -> bytes:
    codes = rng.integers(0, 4, size=length)
    seq = BASES[codes].copy()
    if n_prob > 0:
        mask = rng.random(length) < n_prob
        seq[mask] = ord("N")
    return seq.tobytes()


def mutate(rng: np.random.Generator, seq: bytes, sub_rate: float) -> bytes:
    """Substitute bases at `sub_rate` (always to a different base)."""
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    acgt = np.isin(arr, BASES)
    hit = acgt & (rng.random(len(arr)) < sub_rate)
    idx = np.where(hit)[0]
    code = np.searchsorted(BASES, arr[idx])  # BASES is sorted (A<C<G<T)
    new_code = (code + rng.integers(1, 4, size=len(idx))) % 4
    arr[idx] = BASES[new_code]
    return arr.tobytes()


def write_fasta(path: Path, records, line_width: int = 70, gz: bool = False) -> Path:
    out = bytearray()
    for name, seq in records:
        out += b">" + name.encode() + b"\n"
        for i in range(0, len(seq), line_width):
            out += seq[i : i + line_width] + b"\n"
    data = bytes(out)
    if gz:
        data = gzip.compress(data)
    path.write_bytes(data)
    return path


def write_fastq(path: Path, records, gz: bool = False) -> Path:
    out = bytearray()
    for name, seq in records:
        out += b"@" + name.encode() + b"\n" + seq + b"\n+\n" + b"I" * len(seq) + b"\n"
    data = bytes(out)
    if gz:
        data = gzip.compress(data)
    path.write_bytes(data)
    return path


def make_genome_family(
    rng: np.random.Generator, n: int, length: int, sub_rate: float = 0.02
) -> list[bytes]:
    """n related genomes: one ancestor + n-1 mutated descendants."""
    root = random_seq(rng, length)
    return [root] + [mutate(rng, root, sub_rate) for _ in range(n - 1)]


def reads_from_genome(
    rng: np.random.Generator, genome: bytes, n_reads: int, read_len: int
) -> list[bytes]:
    starts = rng.integers(0, max(1, len(genome) - read_len), size=n_reads)
    return [genome[s : s + read_len] for s in starts]


def random_genome_fasta(
    path: Path, rng: np.random.Generator, n_records: int = 1, length: int = 1000,
    n_prob: float = 0.0, gz: bool = False,
) -> Path:
    """Write a random multi-record FASTA genome; returns the path."""
    records = [(f"rec{i}", random_seq(rng, length, n_prob)) for i in range(n_records)]
    return write_fasta(path, records, gz=gz)


def random_reads_fastq(
    path: Path, rng: np.random.Generator, n_reads: int = 100, length: int = 100,
    gz: bool = False,
) -> Path:
    """Write a random FASTQ read set; returns the path."""
    records = [(f"read{i}", random_seq(rng, length)) for i in range(n_reads)]
    return write_fastq(path, records, gz=gz)
