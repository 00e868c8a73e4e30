"""Hessian eigen, fitting, active-learning, multimodal operator tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tracy_matdb_spark.operators.active import add_configs, generate_until_count
from tracy_matdb_spark.operators.fitting import dbfilter_exclude, quantities, validation_rms
from tracy_matdb_spark.operators.hessian import ZERO_TOL, eigen_explode, synth_hessian
from tracy_matdb_spark.operators.multimodal import extract_features, frame_sample, synth_media


def test_hessian_eigen_identities(spark):
    seeds = spark.createDataFrame([("fcc", 2), ("bcc", 3)], "seed_id string, n_atoms int")
    pdf = eigen_explode(seeds).toPandas()
    for sid, n in [("fcc", 2), ("bcc", 3)]:
        h = synth_hessian(sid, n)
        sub = pdf[pdf.seed_id == sid].sort_values("eig_index")
        # 3 translational zero-modes dropped (hessian.py:252-253)
        assert len(sub) == 3 * n - 3
        for _, r in sub.iterrows():
            v = np.vstack([np.asarray(x, dtype=float) for x in r["eigenvector"]]).reshape(-1)
            assert abs(np.linalg.norm(v) - 1) < 1e-8
            # H v = lambda v
            assert np.allclose(h @ v, r["eigenvalue"] * v, atol=1e-6)
            assert abs(r["eigenvalue"]) >= ZERO_TOL


def test_hessian_deterministic_under_repartition(spark):
    seeds = spark.createDataFrame([("x", 3)], "seed_id string, n_atoms int")
    a = eigen_explode(seeds).toPandas().sort_values("eig_index").eigenvalue.tolist()
    b = eigen_explode(seeds.repartition(8)).toPandas().sort_values("eig_index").eigenvalue.tolist()
    assert a == b


def test_dbfilter_and_quantities(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, 50.0, "b"), (3, None, "c")], "id long, e double, t string"
    )
    kept = dbfilter_exclude(df, "e", ">", 10.0).toPandas()
    assert sorted(kept.id) == [1, 3]  # excluded the match; NULL survives
    q = quantities(df, ["e"], aggregate="numpy.mean").toPandas()
    assert abs(q.iloc[0, 0] - 26.0) < 1e-9


def test_validation_rms_matches_numpy(spark):
    vals = [(float(i), float(i) + (i % 3 - 1) * 0.5) for i in range(100)]
    df = spark.createDataFrame(vals, "ref double, pred double")
    got = validation_rms(df, "ref", "pred").toPandas().iloc[0]
    delta = np.array([r - p for r, p in vals])
    assert abs(got["rms"] - np.sqrt((delta**2).mean())) < 1e-9
    assert abs(got["residual_std"] - delta.std()) < 1e-9


def test_active_learning_dedupe(spark):
    b0 = spark.createDataFrame([(1, "h1"), (2, "h2")], "id long, duid string")
    b1 = spark.createDataFrame([(3, "h2"), (4, "h3")], "id long, duid string")
    hist = add_configs(None, b0, 0)
    hist = add_configs(hist, b1, 1)
    pdf = hist.toPandas().sort_values("id")
    assert sorted(pdf.duid) == ["h1", "h2", "h3"]  # h2 duplicate dropped
    assert pdf[pdf.duid == "h2"].iteration.iloc[0] == 0  # first writer wins


def test_generate_until_count(spark):
    def make_batch(it):
        return spark.range(5).select(
            F.col("id"), F.concat(F.lit(f"b{it}-"), (F.col("id") % 3).cast("string")).alias("duid")
        )

    hist, iters = generate_until_count(make_batch, target=7, uid="duid", max_iterations=5)
    # each batch contributes 3 unique duids; 7 requires 3 iterations
    assert iters == 3
    assert hist.count() == 7


def test_multimodal_plumbing(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media).toPandas()
    assert len(feats) == 30
    assert feats.feature.map(len).eq(8).all()
    assert (feats.n_bytes > 0).all()
    # deterministic under repartition
    feats2 = extract_features(media.repartition(7)).toPandas()
    m1 = feats.set_index("media_id").content_sha
    m2 = feats2.set_index("media_id").content_sha
    assert m1.sort_index().equals(m2.sort_index())
    frames = frame_sample(media, every=10).toPandas()
    assert (frames.frame % 10 == 0).all()
    n_videos = (len([i for i in range(30) if i % 3 == 2]))
    assert len(frames) == n_videos * 3  # frames 0,10,20 of 30


def test_hnf_enumeration_counts(spark):
    from tracy_matdb_spark.operators.crystal import conform_supercell, hnf_enumerate, vegard

    # number of HNFs of determinant n is sum_{a*c*f=n} c*f^2 (classic result;
    # reference enumerates the same set in database/utility.py:383-496)
    def expected(n):
        total = 0
        for a in range(1, n + 1):
            if n % a:
                continue
            for c in range(1, n // a + 1):
                if (n // a) % c:
                    continue
                f = n // (a * c)
                total += c * f * f
        return total

    counts = {
        r.det: r.cnt
        for r in hnf_enumerate(spark, 8).groupBy("det").count().withColumnRenamed("count", "cnt").collect()
    }
    for n in range(1, 9):
        assert counts[n] == expected(n), n

    # conform_supercell: 3 / 9 / 3x3 forms (transforms.py:32-52)
    assert conform_supercell([2, 2, 2]) == [[2, 0, 0], [0, 2, 0], [0, 0, 2]]
    assert conform_supercell([1, 0, 0, 0, 1, 0, 0, 0, 1]) == [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    assert conform_supercell([[1, 2, 3], [4, 5, 6], [7, 8, 9]])[1] == [4, 5, 6]

    # vegard's law is a plain weighted mean (data.py:30-40)
    assert abs(vegard({"Ag": 0.5, "Pd": 0.5}) - (4.09 + 3.89) / 2) < 1e-12


def test_householder_hessian_known_spectrum(spark):
    import numpy as np

    from tracy_matdb_spark.operators.hessian import eigen_exact_explode, householder_hessian

    h, lam = householder_hessian(3)
    vals = np.linalg.eigh(h)[0]
    assert np.allclose(vals, lam, atol=1e-10)  # spectrum is exactly the design
    assert np.allclose(h, h.T)

    seeds = spark.createDataFrame([("s", 2)], "seed_id string, n_atoms int")
    rows = eigen_exact_explode(seeds).orderBy("eig_index").collect()
    assert [r["eigenvalue_r"] for r in rows] == [i + 1.125 for i in range(6)]
    assert all(r["resid_ok"] and r["unit_ok"] for r in rows)
