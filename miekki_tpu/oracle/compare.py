"""Pure-numpy oracle for sketch comparison and distance estimation.

Contract: SURVEY.md §2.1 (components C7, C8; reference source unavailable —
SURVEY.md §0).  Estimators follow the Mash paper (Ondov et al. 2016):

  * Jaccard from two bottom-s sketches: let X = bottom_s(S(A) ∪ S(B));
    j_hat = |X ∩ S(A) ∩ S(B)| / |X|.
  * Mash distance: D = -(1/k) * ln(2 j / (1 + j)); D = 1 when j = 0.
  * ANI = 1 - D (clamped to [0, 1]).
  * Containment of a sketch in a hash set: c = |S(A) ∩ H| / |S(A)|.
"""

from __future__ import annotations

import math

import numpy as np

from . import nthash


def intersection_size(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∩ B| for two sorted-distinct uint64 arrays (sentinel excluded)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    common = np.intersect1d(a, b, assume_unique=True)
    return int(np.count_nonzero(common != nthash.UINT64_MAX))


def mash_jaccard(a: np.ndarray, b: np.ndarray, s: int):
    """(shared, union_size, j_hat) via the Mash bottom-s-of-union estimator.

    a, b: sorted distinct uint64 sketches (no sentinel entries).
    union_size = |X| = min(s, |A ∪ B|); shared = |X ∩ A ∩ B|.
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    union = np.union1d(a, b)  # sorted distinct
    x = union[:s]
    if len(x) == 0:
        return 0, 0, 0.0
    common = np.intersect1d(a, b, assume_unique=True)
    shared = int(np.count_nonzero(np.isin(x, common, assume_unique=True)))
    return shared, len(x), shared / len(x)


def mash_distance(j: float, k: int) -> float:
    """Mash distance from a Jaccard estimate (Mash paper Eq. 4)."""
    if j <= 0.0:
        return 1.0
    if j >= 1.0:
        return 0.0
    d = -math.log(2.0 * j / (1.0 + j)) / k
    return min(max(d, 0.0), 1.0)


def ani_from_distance(d: float) -> float:
    return min(max(1.0 - d, 0.0), 1.0)


def containment(query_sketch: np.ndarray, target_hashes: np.ndarray) -> float:
    """c = |S(query) ∩ H(target)| / |S(query)| (0.0 for an empty sketch)."""
    q = np.asarray(query_sketch, dtype=np.uint64)
    q = q[q != nthash.UINT64_MAX]
    if len(q) == 0:
        return 0.0
    t = np.unique(np.asarray(target_hashes, dtype=np.uint64))
    shared = int(np.count_nonzero(np.isin(q, t, assume_unique=True)))
    return shared / len(q)


def ani_from_containment(c: float, k: int) -> float:
    """ANI estimate from containment: 1 + ln(c)/k, clamped (SURVEY.md §2.1)."""
    if c <= 0.0:
        return 0.0
    return min(max(1.0 + math.log(c) / k, 0.0), 1.0)


def chance_p_value(shared: int, union: int, n1: float, n2: float, k: int) -> float:
    """Mash-style p-value: probability of observing >= `shared` common
    hashes among `union` bottom-s union slots by CHANCE between two
    unrelated random genomes of (estimated) distinct-k-mer cardinalities
    n1, n2 (Mash paper, Ondov et al. 2016, reports the analogous statistic;
    exact reference formula unavailable — SURVEY.md §0 — so this is a
    documented binomial formulation over the same null model).

    Null model: k-mers are uniform over the 4^k canonical space, so the
    expected chance-shared distinct k-mers are m = n1*n2/4^k and a random
    element of the union is shared with probability q = m/(n1 + n2 - m).
    X ~ Binomial(union, q); p = P(X >= shared) = I_q(shared, union-shared+1)
    via the regularized incomplete beta (O(1) per pair — the earlier exact
    summation was O(shared) host-side Python per pair, a hidden wall at
    10k-genome scale; ADVICE r1).
    """
    if shared <= 0:
        return 1.0
    space = 4.0 ** min(k, 200)
    m = (n1 * n2) / space
    denom = n1 + n2 - m
    q = 0.0 if denom <= 0 else min(max(m / denom, 0.0), 1.0)
    if q <= 0.0:
        return 0.0 if shared > 0 else 1.0
    if q >= 1.0:
        return 1.0
    shared = min(shared, union)
    return min(max(_betainc(float(shared), float(union - shared + 1), q), 0.0), 1.0)


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) via the standard Lentz
    continued fraction (Numerical Recipes 6.4 formulation; |rel err| ~1e-14
    — cross-checked against exact binomial summation in tests)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h


def jaccard_ci(shared: int, union: int, conf: float = 0.95):
    """Wilson score interval for the Jaccard estimate (the `mash bounds`
    analog): treats shared ~ Binomial(union, j).  Returns (lo, hi)."""
    if union <= 0:
        return 0.0, 1.0
    # z for the two-sided confidence level via the probit of (1+conf)/2
    # (Acklam rational approximation — scipy-free, |eps| < 1.2e-9)
    z = _probit(0.5 + conf / 2.0)
    n = float(union)
    p = shared / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return max(0.0, center - half), min(1.0, center + half)


def distance_ci(shared: int, union: int, k: int, conf: float = 0.95):
    """Mash-distance interval from the Jaccard interval (d is decreasing in
    j, so the bounds swap)."""
    j_lo, j_hi = jaccard_ci(shared, union, conf)
    return mash_distance(j_hi, k), mash_distance(j_lo, k)


def _probit(p: float) -> float:
    """Inverse standard-normal CDF (Acklam 2003 rational approximation)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    if p > p_high:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    q = p - 0.5
    r = q * q
    return (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q / \
           (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)


def kmv_cardinality(sketch: np.ndarray, s: int) -> float:
    """Distinct-canonical-k-mer estimate from a bottom-s sketch.

    The canonical hash is min(forward, reverse) of two ~iid uniforms, so
    its CDF at quantile q = v/2^64 is 2q - q²; with v_s the s-th smallest:
    solve 2q - q² = s/(n+1) → n̂ = s/(2q - q²) - 1.  Exact (=len) when the
    genome has fewer than s distinct k-mers.  This is THE cardinality
    estimator — index.store.SketchIndex.cardinalities delegates here so
    engine and oracle p-values agree bitwise."""
    sk = np.asarray(sketch, dtype=np.uint64)
    sk = sk[sk != nthash.UINT64_MAX]
    if len(sk) < s:
        return float(len(sk))
    q = float(sk[-1]) / 2.0**64
    return s / max(2.0 * q - q * q, 1e-300) - 1.0


def compare_sketches(a: np.ndarray, b: np.ndarray, k: int, s: int) -> dict:
    """Full pairwise record (matches one TSV row of the `dist` command)."""
    shared, union_size, j = mash_jaccard(a, b, s)
    d = mash_distance(j, k)
    return {
        "shared": shared,
        "union": union_size,
        "jaccard": j,
        "distance": d,
        "ani": ani_from_distance(d),
        "p_value": chance_p_value(
            shared, union_size, kmv_cardinality(a, s), kmv_cardinality(b, s), k
        ),
    }


def all_vs_all(sketches, k: int, s: int):
    """Upper-triangle pairwise comparison of a list of sketches (oracle)."""
    n = len(sketches)
    rows = []
    for i in range(n):
        for jdx in range(i + 1, n):
            rec = compare_sketches(sketches[i], sketches[jdx], k, s)
            rec["i"], rec["j"] = i, jdx
            rows.append(rec)
    return rows
