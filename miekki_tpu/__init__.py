"""miekki_tpu — a TPU-native genomic sketching engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the C++
reference Malfoy/Miekki (SURVEY.md; reference source unavailable at survey
time, see SURVEY.md §0): streaming k-mer extraction and canonicalization from
FASTA/FASTQ, ntHash-style rolling hashing, bottom-s MinHash sketches, and
sketch intersection yielding Jaccard / containment / Mash distance / ANI,
scaled over TPU meshes with sharded sketch databases.
"""

from .params import HASH_VERSION, SketchParams  # noqa: F401


def __getattr__(name):
    # Lazy: importing miekki_tpu must not pull in jax (oracle/IO users).
    if name in ("build_index", "sketch_file", "dist", "dist_iter", "screen",
                "rows_to_tsv"):
        from . import engine

        return getattr(engine, name)
    if name == "SketchIndex":
        from .index.store import SketchIndex

        return SketchIndex
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__version__ = "0.1.0"
