"""Derive symmetry-reduced derivative-structure counts by EXHAUSTIVE
orbit enumeration — the independent oracle for `enumerated_point_group`,
`enumerated_point_group_hcp` and `enumerated_point_group_custom`.

Independence contract (round-4 verdict item #3): this tool shares NO
group construction, canonicalization, or coset machinery with the
production module. The only production import is `hnf_tuples` — the
pure combinatorial enumeration of normalized HNF tuples — because the
two sides MUST agree on (a) which tuples exist and their normalization
(columns (a,b,d),(0,c,e),(0,0,f), 0<=b<c, 0<=d,e<f) and (b) the coset
representative box [0,a) x [0,c) x [0,f); those are conventions, not
algorithms under test. Everything else is local and deliberately built
differently:

* point groups come from a Gram-matrix preservation search over COLUMN
  images with exact Cauchy-Schwarz entry bounds from the inverse Gram
  (production: named groups by basis conjugation of Cartesian Oh /
  block D6h construction, custom groups by a row search with a trace
  eigenbound, then transposed);
* space-group fractional translations are resolved by a local basis-map
  search (production: operators/enumerated.space_ops);
* rotated superlattices A @ M are classified against hnf_tuples(n) by
  the exact integer-unimodular lattice-equality test
  adj(M2) @ (A @ M) == 0 (mod n) — no Hermite normal form is computed
  at all (production canonicalizes with column_hnf);
* orbits are unioned with a disjoint-set structure over every
  (HNF, labeling) pair (production: canonical-min over numpy orbit
  images inside applyInPandas).

Structures fixed by a nonzero pure lattice translation are
superperiodic (their true cell is smaller) and are excluded, matching
the Hart-Forcade enumeration's removal of duplicates of smaller cells
(reference matdb/database/enumerated.py:387-429 delegates this to
phenum; the published algorithm is Hart & Forcade, PRB 77 224115).

External anchors: the sc/fcc/bcc counts reproduce the published Hart &
Forcade table (binary fcc sizes 1..8 sum to 631); tests additionally
assert this tool's local groups coincide with the production module's
op sets (48/48/48/24) — a cross-check, not a dependency.

Usage: python tools/derive_enum_oracle.py [max_size] [k] [lattices...]
Lattices: sc fcc bcc hcp or a custom[g11,g12,g13,g22,g23,g33](@basis)
spec. Prints one line per (lattice, size): n_hnfs_reduced n_unique.
"""

from __future__ import annotations

import sys
from fractions import Fraction

sys.path.insert(0, ".")

from tracy_matdb_spark.operators.enumerated import hnf_tuples

Half = Fraction(1, 2)

# Gram matrices of the named parent lattices in their primitive bases
# (units: a=1 in-plane for hcp with an arbitrary non-integer rational
# (c/a)^2 = 5/2 — the hexagonal group is independent of c because no
# in-plane integer vector can have the c-axis norm when c^2 is not an
# integer; fcc/bcc from the standard primitive vectors in units a/2).
GRAMS: dict[str, list[list[Fraction]]] = {
    "sc": [[Fraction(1), Fraction(0), Fraction(0)],
           [Fraction(0), Fraction(1), Fraction(0)],
           [Fraction(0), Fraction(0), Fraction(1)]],
    "fcc": [[Fraction(2), Fraction(1), Fraction(1)],
            [Fraction(1), Fraction(2), Fraction(1)],
            [Fraction(1), Fraction(1), Fraction(2)]],
    "bcc": [[Fraction(3), Fraction(-1), Fraction(-1)],
            [Fraction(-1), Fraction(3), Fraction(-1)],
            [Fraction(-1), Fraction(-1), Fraction(3)]],
    "hcp": [[Fraction(1), -Half, Fraction(0)],
            [-Half, Fraction(1), Fraction(0)],
            [Fraction(0), Fraction(0), Fraction(5, 2)]],
}

BASES: dict[str, list[tuple[Fraction, Fraction, Fraction]]] = {
    "hcp": [
        (Fraction(0), Fraction(0), Fraction(0)),
        (Fraction(1, 3), Fraction(2, 3), Fraction(1, 2)),
    ],
}


def parse_lattice(lattice: str):
    """(gram, basis) for a named lattice or a custom[...] spec (local
    parser — the spec FORMAT is shared with the production module, the
    parsing is not)."""
    if lattice in GRAMS:
        basis = BASES.get(lattice, [(Fraction(0), Fraction(0), Fraction(0))])
        return GRAMS[lattice], basis
    if not lattice.startswith("custom["):
        raise SystemExit(f"unknown lattice {lattice!r}")
    body = lattice[len("custom[") :]
    gram_s, sep, basis_s = body.partition("]")
    assert sep, lattice
    g11, g12, g13, g22, g23, g33 = (Fraction(v) for v in gram_s.split(","))
    G = [[g11, g12, g13], [g12, g22, g23], [g13, g23, g33]]
    basis = [(Fraction(0), Fraction(0), Fraction(0))]
    if basis_s:
        assert basis_s.startswith("@"), lattice
        basis = [tuple(Fraction(x) for x in atom.split(",")) for atom in basis_s[1:].split(";")]
        assert basis[0] == (0, 0, 0), "basis must start at the origin"
    return G, basis


def inv3(G):
    det = (
        G[0][0] * (G[1][1] * G[2][2] - G[1][2] * G[2][1])
        - G[0][1] * (G[1][0] * G[2][2] - G[1][2] * G[2][0])
        + G[0][2] * (G[1][0] * G[2][1] - G[1][1] * G[2][0])
    )
    adj = [
        [
            G[(j + 1) % 3][(i + 1) % 3] * G[(j + 2) % 3][(i + 2) % 3]
            - G[(j + 1) % 3][(i + 2) % 3] * G[(j + 2) % 3][(i + 1) % 3]
            for j in range(3)
        ]
        for i in range(3)
    ]
    return [[adj[i][j] / det for j in range(3)] for i in range(3)], det


def local_point_group(G) -> list[list[list[int]]]:
    """All integer A with A^T G A == G, searched over COLUMN images:
    column j of A is the image of basis vector e_j, must have G-norm
    G[jj] and G-cross-terms G[ij] with earlier columns. Entry bound is
    the exact Cauchy-Schwarz inequality in the G metric:
    x_i^2 <= (x^T G x) * (G^-1)_{ii}."""
    from itertools import product

    Ginv, _ = inv3(G)

    def quad(v, w):
        return sum(v[i] * G[i][j] * w[j] for i in range(3) for j in range(3))

    cols: list[list[tuple[int, int, int]]] = []
    for j in range(3):
        c = G[j][j]
        bounds = [int((c * Ginv[i][i]) ** 0.5) + 1 for i in range(3)]
        cols.append(
            [
                v
                for v in product(*(range(-b, b + 1) for b in bounds))
                if quad(v, v) == c
            ]
        )
    out = []
    for c0 in cols[0]:
        for c1 in cols[1]:
            if quad(c0, c1) != G[0][1]:
                continue
            for c2 in cols[2]:
                if quad(c0, c2) != G[0][2] or quad(c1, c2) != G[1][2]:
                    continue
                det = (
                    c0[0] * (c1[1] * c2[2] - c1[2] * c2[1])
                    - c1[0] * (c0[1] * c2[2] - c0[2] * c2[1])
                    + c2[0] * (c0[1] * c1[2] - c0[2] * c1[1])
                )
                if det in (1, -1):
                    out.append([[c0[i], c1[i], c2[i]] for i in range(3)])
    return out


def local_space_ops(G, basis):
    """[(A, bm)] with bm[beta] = (beta', w): point-group ops paired with
    their resolved basis maps; candidate fractional translations are the
    basis positions (A tau_0 + v = v must land on an atom). Ops no basis
    map resolves are dropped (custom bases may break lattice symmetry)."""
    out = []
    for A in local_point_group(G):
        resolved = None
        for v in basis:
            bm = []
            for tau in basis:
                img = tuple(
                    sum(Fraction(A[i][t]) * tau[t] for t in range(3)) + v[i] for i in range(3)
                )
                hit = None
                for b2, tau2 in enumerate(basis):
                    d = tuple(img[i] - tau2[i] for i in range(3))
                    if all(x.denominator == 1 for x in d):
                        hit = (b2, tuple(int(x) for x in d))
                        break
                if hit is None:
                    bm = None
                    break
                bm.append(hit)
            if bm is not None:
                resolved = bm
                break
        if resolved is not None:
            out.append((A, resolved))
    return out


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


def adj_of(h: tuple[int, ...]) -> list[list[int]]:
    a, b, c, d, e, f = h
    return [[c * f, 0, 0], [-b * f, a * f, 0], [b * e - c * d, -a * e, a * c]]


def matmul(A, M):
    return [[sum(A[i][t] * M[t][j] for t in range(3)) for j in range(3)] for i in range(3)]


def coset(x: tuple[int, int, int], h: tuple[int, ...]) -> tuple[int, int, int]:
    """Representative of x + M Z^3 in the box [0,a) x [0,c) x [0,f):
    peel each HNF column in turn (shared CONVENTION with the production
    site_reduce — the box choice must match hnf_tuples' normalization —
    but locally coded)."""
    a, b, c, d, e, f = h
    x1, x2, x3 = x
    q1, x1 = divmod(x1, a)
    x2 -= q1 * b
    x3 -= q1 * d
    q2, x2 = divmod(x2, c)
    x3 -= q2 * e
    x3 %= f
    return (x1, x2, x3)


def cells_of(h: tuple[int, ...]) -> list[tuple[int, int, int]]:
    a, b, c, d, e, f = h
    return [(i, j, l) for i in range(a) for j in range(c) for l in range(f)]


def classify(AM: list[list[int]], hnfs: list[tuple[int, ...]], n: int) -> int:
    """Index of the unique h2 in hnfs spanning the same sublattice as
    the columns of AM: lattice equality <=> M2^-1 AM integer, checked
    exactly as adj(M2) @ AM == 0 (mod n). No Hermite reduction."""
    for i, h2 in enumerate(hnfs):
        adj = adj_of(h2)
        if all(
            sum(adj[r][t] * AM[t][j] for t in range(3)) % n == 0
            for r in range(3)
            for j in range(3)
        ):
            return i
    raise AssertionError("rotated superlattice matches no HNF")


def brute_counts(lattice: str, n: int, k: int = 2) -> tuple[int, int]:
    """(#HNF classes under the crystal point group, #primitive structure
    orbits under space-group ops + lattice translations) at index n, by
    explicit orbit union over (cell coset, basis atom) sites."""
    G, basis = parse_lattice(lattice)
    sops = local_space_ops(G, basis)
    nb = len(basis)
    hnfs = hnf_tuples(n)
    ns = n * nb  # sites per structure

    # image HNF index for every (hnf, op) pair — computed once, used by
    # both the HNF-class and structure-orbit stages
    hmap = [[classify(matmul(A, mat_of(h)), hnfs, n) for A, _ in sops] for h in hnfs]

    # --- HNF orbits (lattice-level: basis maps do not matter) ---
    dsu_h = DSU(len(hnfs))
    for hi in range(len(hnfs)):
        for oi in range(len(sops)):
            dsu_h.union(hi, hmap[hi][oi])
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
        cells = cells_of(h)
        sites = [(x, b) for x in cells for b in range(nb)]
        sidx = {s: i for i, s in enumerate(sites)}
        # pure lattice translations: mark superperiodic + union (same HNF)
        tperms = []
        for t in cells:
            perm = [
                sidx[(coset((x[0] + t[0], x[1] + t[1], x[2] + t[2]), h), b)]
                for x, b in sites
            ]
            tperms.append((t, perm))
        # space ops: transport labeling onto the image HNF
        operms = []
        for oi, (A, bm) in enumerate(sops):
            hi2 = hmap[hi][oi]
            h2 = hnfs[hi2]
            cells2 = cells_of(h2)
            sidx2 = {(x, b): i for i, (x, b) in enumerate((x, b) for x in cells2 for b in range(nb))}
            perm = []
            for x, b in sites:
                b2, w = bm[b]
                y = coset(
                    (
                        A[0][0] * x[0] + A[0][1] * x[1] + A[0][2] * x[2] + w[0],
                        A[1][0] * x[0] + A[1][1] * x[1] + A[1][2] * x[2] + w[1],
                        A[2][0] * x[0] + A[2][1] * x[1] + A[2][2] * x[2] + w[2],
                    ),
                    h2,
                )
                perm.append(sidx2[(y, b2)])
            operms.append((hi2, perm))
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
