"""Derive symmetry-reduced derivative-structure counts by EXHAUSTIVE
orbit enumeration — the independent oracle for `enumerated_point_group`.

This deliberately does NOT use the Spark path's canonical-min machinery:
it builds every (HNF, labeling) pair for each size, applies every
point-group op (transporting the labeling onto the rotated lattice's
HNF) and every translation, and unions orbits with a disjoint-set
structure. Structures fixed by a nonzero pure translation are
superperiodic (their true cell is smaller) and are excluded, matching
the Hart-Forcade enumeration's removal of duplicates of smaller cells
(reference matdb/database/enumerated.py:387-429 delegates this to
phenum; the published algorithm is Hart & Forcade, PRB 77 224115).

Usage: python tools/derive_enum_oracle.py [max_size] [k]
Prints one line per (lattice, size): n_hnfs_reduced n_unique.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tracy_matdb_spark.operators.enumerated import (
    column_hnf,
    hnf_tuples,
    point_group,
    site_reduce,
    sites_of,
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
    under point group + translations) at index n, by explicit orbit union."""
    ops = point_group(lattice)
    hnfs = hnf_tuples(n)
    # --- HNF orbits ---
    hidx = {h: i for i, h in enumerate(hnfs)}
    dsu_h = DSU(len(hnfs))
    for h in hnfs:
        M = mat_of(h)
        for A in ops:
            dsu_h.union(hidx[h], hidx[column_hnf(matmul(A, M))])
    n_hnf_classes = len({dsu_h.find(i) for i in range(len(hnfs))})

    # --- structure orbits ---
    # object id: (hnf index, labeling as base-k int over sites in sites_of order)
    obj = {}
    objs = []
    for hi, h in enumerate(hnfs):
        for lid in range(k**n):
            obj[(hi, lid)] = len(objs)
            objs.append((hi, lid))
    dsu = DSU(len(objs))
    superperiodic = [False] * len(objs)
    for hi, h in enumerate(hnfs):
        M = mat_of(h)
        sites = sites_of(h)
        sidx = {s: i for i, s in enumerate(sites)}
        # pure translations: mark superperiodic + union (same HNF)
        tperms = []
        for t in sites:
            perm = [sidx[site_reduce((x[0] + t[0], x[1] + t[1], x[2] + t[2]), h)] for x in sites]
            tperms.append((t, perm))
        # point ops: transport labeling onto column_hnf(A @ M)
        operms = []
        for A in ops:
            h2 = column_hnf(matmul(A, M))
            sites2 = sites_of(h2)
            sidx2 = {s: i for i, s in enumerate(sites2)}
            # site x of M maps to point A x, reduced into h2's cell
            perm = [
                sidx2[
                    site_reduce(
                        (
                            A[0][0] * x[0] + A[0][1] * x[1] + A[0][2] * x[2],
                            A[1][0] * x[0] + A[1][1] * x[1] + A[1][2] * x[2],
                            A[2][0] * x[0] + A[2][1] * x[1] + A[2][2] * x[2],
                        ),
                        h2,
                    )
                ]
                for x in sites
            ]
            operms.append((hidx[h2], perm))
        for lid in range(k**n):
            digits = []
            v = lid
            for _ in range(n):
                digits.append(v % k)
                v //= k
            me = obj[(hi, lid)]
            for t, perm in tperms:
                # relabeled: new label at site i = old label at perm[i]
                lid2 = sum(digits[perm[i]] * (k**i) for i in range(n))
                dsu.union(me, obj[(hi, lid2)])
                if t != (0, 0, 0) and lid2 == lid:
                    superperiodic[me] = True
            for hi2, perm in operms:
                # labeling'(perm[i]-th site of h2) = labeling(i-th site of h)
                newd = [0] * n
                for i in range(n):
                    newd[perm[i]] = digits[i]
                lid2 = sum(newd[i] * (k**i) for i in range(n))
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
    for lattice in ("sc", "fcc", "bcc"):
        for n in range(1, max_size + 1):
            nh, nu = brute_counts(lattice, n, k)
            print(f"{lattice} {n} {nh} {nu}", flush=True)
