"""Enumerated generator: SNF, translation canonicalization, Burnside counts.

Reference: matdb/database/enumerated.py:33-449 (enumerate 387-429,
retry loop 376-379, euid dedupe 415-427).
"""

from tracy_matdb_spark.operators.enumerated import (
    _canonical_labeling,
    enumerated_counts,
    enumerated_until_nconfigs,
    smith_diagonal,
)


def test_smith_diagonal_identity_and_diag():
    assert smith_diagonal([[1, 0, 0], [0, 1, 0], [0, 0, 1]]) == (1, 1, 1)
    assert smith_diagonal([[2, 0, 0], [0, 2, 0], [0, 0, 1]]) == (1, 2, 2)
    assert smith_diagonal([[1, 0, 0], [0, 1, 0], [0, 0, 4]]) == (1, 1, 4)


def test_smith_diagonal_nontrivial_hnf():
    # [[1,0,0],[1,2,0],[1,1,2]] has det 4; invariant factors divide chain
    d = smith_diagonal([[1, 0, 0], [1, 2, 0], [1, 1, 2]])
    assert d[0] * d[1] * d[2] == 4
    assert d[1] % d[0] == 0 and d[2] % d[1] == 0


def test_canonical_labeling_translation_invariant():
    # Z4: labeling 0001 and all its cyclic shifts share one canonical form
    canon = {_canonical_labeling(1, 1, 4, 1 << (k), 2) for k in range(4)}
    assert len(canon) == 1
    # ...and it is the lexicographic minimum of the orbit
    assert canon.pop() == "0001"


def test_canonical_labeling_z2xz2():
    # In Z2 x Z2 every single-'1' labeling is equivalent (group acts
    # transitively on itself)
    canon = {_canonical_labeling(1, 2, 2, 1 << k, 2) for k in range(4)}
    assert len(canon) == 1


def test_burnside_counts(spark):
    pdf = enumerated_counts(spark, 4).toPandas()
    got = {int(r["size"]): (int(r["n_hnfs"]), int(r["n_unique"])) for _, r in pdf.iterrows()}
    # Burnside: see queries/domain.py enumerated_generate oracle comment
    assert got == {1: (1, 2), 2: (7, 21), 3: (13, 52), 4: (35, 217)}


def test_until_nconfigs_exact_and_deterministic(spark):
    a = enumerated_until_nconfigs(spark, nconfigs=30, k=2).toPandas()
    b = enumerated_until_nconfigs(spark, nconfigs=30, k=2).toPandas()
    assert len(a) == 30
    assert a["euid"].tolist() == b["euid"].tolist()
    # sizes 1-2 (23 structures) fully kept, remainder from size 3
    assert (a["size"] <= 3).all()
    assert (a["size"] <= 2).sum() == 23
