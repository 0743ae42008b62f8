"""miekki_tpu — a TPU-native genomic sketching engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the C++
reference Malfoy/Miekki (SURVEY.md; reference source unavailable at survey
time, see SURVEY.md §0): streaming k-mer extraction and canonicalization from
FASTA/FASTQ, ntHash-style rolling hashing, bottom-s MinHash sketches, and
sketch intersection yielding Jaccard / containment / Mash distance / ANI,
scaled over TPU meshes with sharded sketch databases.
"""

from .params import HASH_VERSION, SketchParams  # noqa: F401

__version__ = "0.1.0"
