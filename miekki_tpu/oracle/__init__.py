"""Pure-numpy CPU oracle — the bit-exact parity anchor for the TPU path.

The reference C++ source was unavailable at survey time (SURVEY.md §0); this
oracle implements the frozen algorithmic contracts of SURVEY.md §2.1 and is
what the driver's acceptance configs are checked against (SURVEY.md §4).
"""

from . import compare, nthash, sketch  # noqa: F401
