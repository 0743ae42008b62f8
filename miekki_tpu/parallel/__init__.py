"""Distributed execution (SURVEY.md §2 parallelism table, §3 boundaries, M5).

The reference is a single-node OpenMP tool; this package supplies the
TPU-native distribution the capability contract mandates (BASELINE.json
north_star): sketch DB sharded along the genome axis, all-vs-all tiles
computed with a ppermute ring of column blocks over ICI/DCN, and read
screening data-parallel with partial counts merged collectively.
"""

from .mesh import local_mesh, initialize_distributed  # noqa: F401
from .allvsall import (dist_sharded, dist_sharded_hostring,  # noqa: F401
                       ring_all_vs_all_counts)
from .screen import screen_sharded  # noqa: F401
