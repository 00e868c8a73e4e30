"""Derive symmetry-reduced derivative-structure counts by EXHAUSTIVE
orbit enumeration — the independent oracle for `enumerated_point_group`
and `enumerated_point_group_hcp`.

This deliberately does NOT use the Spark path's canonical-min machinery:
it builds every (HNF, labeling) pair for each size, applies every
space-group op (transporting the labeling onto the rotated lattice's
HNF, basis atoms included) and every lattice translation, and unions
orbits with a disjoint-set structure. Structures fixed by a nonzero
pure lattice translation are superperiodic (their true cell is smaller)
and are excluded, matching the Hart-Forcade enumeration's removal of
duplicates of smaller cells (reference matdb/database/enumerated.py:
387-429 delegates this to phenum; the published algorithm is Hart &
Forcade, PRB 77 224115).

Usage: python tools/derive_enum_oracle.py [max_size] [k] [lattices...]
Prints one line per (lattice, size): n_hnfs_reduced n_unique.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tracy_matdb_spark.operators.enumerated import (
    _basis,
    column_hnf,
    hnf_tuples,
    point_group,
    site_reduce,
    sites_of,
    space_ops,
)


class DSU:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[ra] = rb


def mat_of(h: tuple[int, ...]) -> list[list[int]]:
    a, b, c, d, e, f = h
    return [[a, 0, 0], [b, c, 0], [d, e, f]]


def matmul(A, M):
    return [[sum(A[i][t] * M[t][j] for t in range(3)) for j in range(3)] for i in range(3)]


def brute_counts(lattice: str, n: int, k: int = 2) -> tuple[int, int]:
    """(#HNF classes under the point group, #primitive structure orbits
    under space-group ops + lattice translations) at index n, by
    explicit orbit union over (cell coset, basis atom) sites."""
    ops = point_group(lattice)
    sops = space_ops(lattice)
    basis = _basis(lattice)
    nb = len(basis)
    hnfs = hnf_tuples(n)
    ns = n * nb  # sites per structure
    # --- HNF orbits (lattice-level: basis does not matter) ---
    hidx = {h: i for i, h in enumerate(hnfs)}
    dsu_h = DSU(len(hnfs))
    for h in hnfs:
        M = mat_of(h)
        for A in ops:
            dsu_h.union(hidx[h], hidx[column_hnf(matmul(A, M))])
    n_hnf_classes = len({dsu_h.find(i) for i in range(len(hnfs))})

    # --- structure orbits ---
    obj = {}
    objs = []
    for hi, h in enumerate(hnfs):
        for lid in range(k**ns):
            obj[(hi, lid)] = len(objs)
            objs.append((hi, lid))
    dsu = DSU(len(objs))
    superperiodic = [False] * len(objs)
    for hi, h in enumerate(hnfs):
        M = mat_of(h)
        cells = sites_of(h)
        sites = [(x, b) for x in cells for b in range(nb)]
        sidx = {s: i for i, s in enumerate(sites)}
        # pure lattice translations: mark superperiodic + union (same HNF)
        tperms = []
        for t in cells:
            perm = [
                sidx[(site_reduce((x[0] + t[0], x[1] + t[1], x[2] + t[2]), h), b)]
                for x, b in sites
            ]
            tperms.append((t, perm))
        # space ops: transport labeling onto column_hnf(A @ M)
        operms = []
        for A, bm in sops:
            h2 = column_hnf(matmul(A, M))
            cells2 = sites_of(h2)
            sidx2 = {(x, b): i for i, (x, b) in enumerate((x, b) for x in cells2 for b in range(nb))}
            perm = []
            for x, b in sites:
                b2, w = bm[b]
                y = site_reduce(
                    (
                        A[0][0] * x[0] + A[0][1] * x[1] + A[0][2] * x[2] + w[0],
                        A[1][0] * x[0] + A[1][1] * x[1] + A[1][2] * x[2] + w[1],
                        A[2][0] * x[0] + A[2][1] * x[1] + A[2][2] * x[2] + w[2],
                    ),
                    h2,
                )
                perm.append(sidx2[(y, b2)])
            operms.append((hidx[h2], perm))
        for lid in range(k**ns):
            digits = []
            v = lid
            for _ in range(ns):
                digits.append(v % k)
                v //= k
            me = obj[(hi, lid)]
            for t, perm in tperms:
                # relabeled: new label at site i = old label at perm[i]
                lid2 = sum(digits[perm[i]] * (k**i) for i in range(ns))
                dsu.union(me, obj[(hi, lid2)])
                if t != (0, 0, 0) and lid2 == lid:
                    superperiodic[me] = True
            for hi2, perm in operms:
                # labeling'(perm[i]-th site of h2) = labeling(i-th site of h)
                newd = [0] * ns
                for i in range(ns):
                    newd[perm[i]] = digits[i]
                lid2 = sum(newd[i] * (k**i) for i in range(ns))
                dsu.union(me, obj[(hi2, lid2)])
    # propagate superperiodic to orbit roots, then count clean orbits
    bad = set()
    for i, sp in enumerate(superperiodic):
        if sp:
            bad.add(dsu.find(i))
    roots = {dsu.find(i) for i in range(len(objs))}
    return n_hnf_classes, len(roots - bad)


if __name__ == "__main__":
    max_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lattices = sys.argv[3:] or ["sc", "fcc", "bcc"]
    for lattice in lattices:
        for n in range(1, max_size + 1):
            nh, nu = brute_counts(lattice, n, k)
            print(f"{lattice} {n} {nh} {nu}", flush=True)
