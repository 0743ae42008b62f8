"""Sketch index: the on-disk and in-memory sketch database (component C6).

SURVEY.md §2 C6: the file format is OURS to define (reference source absent;
parity target is the distance table, not file bytes).  Format: a `.npz`
containing the (hi, lo) uint32 planes of the padded [N, s] sketch table plus a
JSON header (params, names, per-genome valid counts).  The sketch DB file is
the checkpoint between the sketch and compare phases (SURVEY.md §5
"Checkpoint / resume"); sharded save/load supports the per-host DB sharding
of SURVEY.md §2's parallelism table.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

import numpy as np

from ..oracle import nthash
from ..params import SketchParams

_FORMAT_VERSION = 1
# Compact files (32-bit fingerprints, no lo array) are a new layout:
# stamping them with a higher version makes a pre-compact reader fail
# with the clean "unsupported index format" error instead of a
# KeyError on the missing lo array.  Readers accept both.
_FORMAT_VERSION_COMPACT = 2


class SketchIndex:
    """In-memory [N, s] sketch table: sorted ascending, UINT64_MAX-padded."""

    def __init__(self, params: SketchParams, names: List[str], hi: np.ndarray, lo: np.ndarray):
        if hi.shape != lo.shape or hi.ndim != 2 or hi.shape[1] != params.s:
            raise ValueError(f"bad sketch table shape: {hi.shape} for s={params.s}")
        if len(names) != hi.shape[0]:
            raise ValueError("names/table length mismatch")
        self.params = params
        self.names = list(names)
        self.hi = np.ascontiguousarray(hi, dtype=np.uint32)
        self.lo = np.ascontiguousarray(lo, dtype=np.uint32)
        # Optional device-resident (hi, lo) copies of the SAME table,
        # attached by the builder when the sketches were just computed on
        # device (engine._build_index_from_codes).  The compare phase then
        # slices blocks on device instead of re-uploading them — the
        # tunneled host→device path measured ~20 MB/s in r4, making block
        # re-upload ~40% of the 10k all-vs-all wall.  Never serialized;
        # loaders leave it None.
        self.device_planes = None

    def __len__(self) -> int:
        return self.hi.shape[0]

    @classmethod
    def from_sketches(
        cls, sketches: Sequence[np.ndarray], names: Sequence[str], params: SketchParams
    ) -> "SketchIndex":
        n = len(sketches)
        table = np.full((n, params.s), nthash.UINT64_MAX, dtype=np.uint64)
        for i, sk in enumerate(sketches):
            sk = np.asarray(sk, dtype=np.uint64)
            if len(sk) > params.s:
                raise ValueError(f"sketch {i} longer than s={params.s}")
            table[i, : len(sk)] = sk
        hi = (table >> np.uint64(32)).astype(np.uint32)
        lo = (table & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        return cls(params, list(names), hi, lo)

    def sketch_u64(self, i: int) -> np.ndarray:
        """Valid (non-sentinel) sketch values of genome i as uint64.

        For a compact index these are the stored code values embedded in
        u64 (code << 32) — the comparison domain; use decode for scale."""
        row = (self.hi[i].astype(np.uint64) << np.uint64(32)) | self.lo[i]
        return row[row != nthash.UINT64_MAX]

    def to_compact(self) -> "SketchIndex":
        """32-bit fingerprint copy of this index (ops/compact.py): values
        become monotone uint32 codes in the hi plane (lo = 0; sentinel
        stays UINT64_MAX), params.compact = True.  Halves the on-disk/IO
        footprint; jaccard/containment gain a ~3e-4 collision bias
        (bounded by test).  Compact indexes cannot be compared to raw
        ones (params mismatch)."""
        from ..ops import compact as _compact
        import dataclasses

        if self.params.compact:
            return self
        vals = (self.hi.astype(np.uint64) << np.uint64(32)) | self.lo
        codes = _compact.encode_u64(vals)
        # Two distinct raw values can collide into one code; the merge
        # count logic treats consecutive equal values as an intersection,
        # so a WITHIN-sketch duplicate would register as a cross-side
        # match against any partner.  Dedup per row (codes are sorted —
        # the transform is monotone): duplicates become sentinels, one
        # re-sort pushes them to the tail.
        dup = np.zeros_like(codes, dtype=bool)
        dup[:, 1:] = codes[:, 1:] == codes[:, :-1]
        codes = np.where(dup, np.uint32(0xFFFFFFFF), codes)
        codes = np.sort(codes, axis=1)
        params = dataclasses.replace(self.params, compact=True)
        return SketchIndex(params, self.names, codes,
                           _compact.lo_plane_np(codes))

    def sizes(self) -> np.ndarray:
        full = (self.hi == 0xFFFFFFFF) & (self.lo == 0xFFFFFFFF)
        return (~full).sum(axis=1).astype(np.int64)

    def cardinalities(self) -> np.ndarray:
        """KMV estimate of each genome's distinct canonical-k-mer count
        (same estimator as oracle.compare.kmv_cardinality — see its
        docstring; property-tested bitwise-equal against it).  Compact
        indexes decode codes to approximate hash values first: KMV is
        scale-dependent, and codes live in a warped 32-bit domain.

        ONE vectorized pass over the [N, s] planes (VERDICT r3 #7: the
        per-genome Python loop was 100k iterations at config-5 scale).
        Sketches are sorted ascending and sentinel-padded, so genome i's
        j-th (= largest valid) element sits at column j-1."""
        n, s = self.hi.shape
        sentinel = (self.hi == 0xFFFFFFFF) & (self.lo == 0xFFFFFFFF)
        j = (s - sentinel.sum(axis=1)).astype(np.int64)  # valid counts
        last_col = np.maximum(j - 1, 0)
        rows = np.arange(n)

        if self.params.compact:
            from ..ops import compact as _compact

            # ALWAYS extrapolate for compact sketches: to_compact's code
            # dedup can leave j < s valid codes on a genome that had >= s
            # distinct k-mers, so the "fewer than s => exact count" branch
            # would return ~j (a ~500x underestimate that poisons the
            # default p_value column).  Solve the canonical-hash CDF
            # 2q - q² = j/(n+1) at the j-th min — valid for any j, and it
            # converges to the exact count on genuinely-small genomes.
            v_last = _compact.decode_approx(self.hi[rows, last_col])
            q = v_last.astype(np.float64) / 2.0 ** 64
            est = j / np.maximum(2.0 * q - q * q, 1e-300) - 1.0
            return np.where(j < 2, j.astype(np.float64), est)

        # Plain u64 sketches: exact count when the genome had fewer than s
        # distinct k-mers, KMV extrapolation from the s-th min otherwise
        # (bit-identical to kmv_cardinality per row).
        v_last = ((self.hi[rows, last_col].astype(np.uint64) << np.uint64(32))
                  | self.lo[rows, last_col])
        q = v_last.astype(np.float64) / 2.0 ** 64
        est = s / np.maximum(2.0 * q - q * q, 1e-300) - 1.0
        return np.where(j < s, j.astype(np.float64), est)

    # ---------- persistence ----------

    def _header(self) -> dict:
        return {
            "format_version": (_FORMAT_VERSION_COMPACT if self.params.compact
                               else _FORMAT_VERSION),
            "params": self.params.to_dict(),
            "names": self.names,
        }

    def save(self, path: str | os.PathLike) -> None:
        arrays = {"hi": self.hi}
        if not self.params.compact:
            arrays["lo"] = self.lo
        # compact: the lo plane is fully determined by hi (0 for values,
        # INF for padding) — omit it so the file is genuinely half-size.
        # Write through a file object: np.savez on a PATH silently appends
        # ".npz", so `sketch -o db.msk` would write db.msk.npz while the
        # CLI reports db.msk (bug found in round-3 end-to-end verify).
        with open(path, "wb") as f:
            np.savez_compressed(
                f,
                header=np.frombuffer(json.dumps(self._header()).encode(),
                                     dtype=np.uint8),
                **arrays,
            )

    @classmethod
    def load(cls, path: str | os.PathLike) -> "SketchIndex":
        with np.load(path) as z:
            header = json.loads(bytes(z["header"]).decode())
            if header.get("format_version") not in (_FORMAT_VERSION,
                                                     _FORMAT_VERSION_COMPACT):
                raise ValueError(f"unsupported index format: {header.get('format_version')}")
            params = SketchParams.from_dict(header["params"])
            hi = z["hi"]
            if params.compact and "lo" not in z:
                from ..ops.compact import lo_plane_np

                lo = lo_plane_np(hi)
            else:
                lo = z["lo"]
            return cls(params, header["names"], hi, lo)

    # ---------- sharding (per-host DB shards, SURVEY.md §2) ----------

    def save_sharded(self, prefix: str, n_shards: int) -> List[str]:
        """Write n_shards files `<prefix>.shard{i:04d}-of-{n}.npz`, splitting
        genomes contiguously along N (genome i → shard i * n // N boundaries)."""
        bounds = np.linspace(0, len(self), n_shards + 1).astype(int)
        paths = []
        for i in range(n_shards):
            a, b = bounds[i], bounds[i + 1]
            part = SketchIndex(self.params, self.names[a:b], self.hi[a:b], self.lo[a:b])
            p = f"{prefix}.shard{i:04d}-of-{n_shards:04d}.npz"
            part.save(p)
            paths.append(p)
        return paths

    @classmethod
    def load_sharded(cls, paths: Sequence[str]) -> "SketchIndex":
        parts = [cls.load(p) for p in sorted(paths)]
        params = parts[0].params
        for p in parts[1:]:
            params.validate_compatible(p.params)
        return cls(
            params,
            [n for p in parts for n in p.names],
            np.concatenate([p.hi for p in parts]),
            np.concatenate([p.lo for p in parts]),
        )
