"""Dedup + ANN operators against planted ground truth.

Synthesizes a corpus with planted exact duplicates and near-duplicates
(word-level perturbations), then checks each dedup strategy finds them,
and measures LSH recall against the exact baselines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from rosreestr_xml_to_gis_converter_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)

VOCAB = [
    "parcel", "cadastral", "survey", "boundary", "polygon", "raster", "tile",
    "image", "caption", "spark", "shuffle", "join", "index", "cell", "river",
    "forest", "field", "road", "house", "garden", "quarter", "district",
]


def _corpus(seed: int, n: int, n_words: int = 60) -> pd.DataFrame:
    """n base docs + per-5th doc an exact dup + per-7th a near dup."""
    rng = np.random.default_rng(seed)
    rows = []
    did = 0
    for i in range(n):
        words = list(rng.choice(VOCAB, size=n_words))
        text = " ".join(words)
        rows.append((did, text, "en", f"src{i % 4}", len(text)))
        did += 1
        if i % 5 == 0:  # exact duplicate
            rows.append((did, text, "en", "dup", len(text)))
            did += 1
        if i % 7 == 0:  # near duplicate: perturb ~5% of words
            w2 = words.copy()
            for j in rng.choice(n_words, size=3, replace=False):
                w2[j] = str(rng.choice(VOCAB))
            t2 = " ".join(w2)
            rows.append((did, t2, "en", "near", len(t2)))
            did += 1
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_corpus(3, 40)).cache()


def test_exact_dedup_finds_planted_duplicates(spark, docs):
    out = exact_dedup(docs).toPandas()
    n_docs = docs.count()
    assert out["n_copies"].sum() == n_docs
    assert (out["n_copies"] >= 2).sum() == 8  # ceil(40/5) planted exact dups
    # keeper is the min doc_id of each group
    assert (out["keeper_id"] < out["keeper_id"] + out["n_copies"]).all()


def test_ngram_jaccard_finds_exact_and_near(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
    # every exact-dup pair has jaccard 1.0; near dups land high too
    assert (pairs["jaccard"] == 1.0).sum() >= 8
    assert len(pairs) >= 8 + 6  # exact + most near pairs


def test_minhash_lsh_recall_vs_exact(spark, docs):
    want = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, threshold=0.5, n_hashes=32, bands=16).collect()
    }
    # verify step guarantees precision; recall should be high at 16 bands
    assert got <= want
    assert len(got) / len(want) >= 0.9, (len(got), len(want))


def test_simhash_flags_near_duplicates(spark, docs):
    pairs = simhash_near_pairs(docs, max_hamming=10).toPandas()
    # exact dups have identical simhash -> hamming 0
    assert (pairs["hamming"] == 0).sum() >= 8
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    want = {
        (r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert len(want & got) / len(want) >= 0.9


def _emb_frame(seed: int, n: int, dim: int = 32) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-dups: every 6th vector is a tiny perturbation of its prev
    for i in range(6, n, 6):
        base[i] = base[i - 1] + rng.standard_normal(dim).astype(np.float32) * 0.05
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    return pd.DataFrame(
        {"vec_id": range(n), "embedding": list(base), "label": [i % 3 for i in range(n)]}
    )


@pytest.fixture(scope="module")
def emb(spark):
    pdf = _emb_frame(9, 120)
    return spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding], int(r.label)) for r in pdf.itertuples()],
        schema="vec_id long, embedding array<float>, label int",
    ).cache()


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = _emb_frame(9, 120)
    mat = np.stack(pdf["embedding"].to_numpy())
    q = (mat * 1000).round()
    sims = (q @ q.T) / np.sqrt((q * q).sum(1)[:, None] * (q * q).sum(1)[None, :])
    np.fill_diagonal(sims, -np.inf)
    queries = emb.filter(F.col("vec_id") < 5)
    got = cosine_topk(emb, queries, k=4).toPandas()
    for qid, grp in got.groupby("query_id"):
        order = np.lexsort((np.arange(len(sims)), -sims[qid]))[:4]
        assert grp.sort_values("rank")["cand_id"].tolist() == order.tolist()


def test_lsh_topk_finds_true_high_similarity_neighbors(spark, emb):
    """Sign-LSH recall is meaningful for genuinely similar vectors (the
    ANN contract), not for near-orthogonal random top-k: query with the
    planted perturbed vectors and require their cosine~0.998 twin at
    rank 1."""
    planted_ids = list(range(6, 120, 6))
    queries = emb.filter(F.col("vec_id").isin(planted_ids))
    got = lsh_topk(emb, queries, k=1, n_planes=10).toPandas()
    hits = sum(
        1
        for _, r in got.iterrows()
        if r["rank"] == 1 and r.cand_id == r.query_id - 1
    )
    assert hits / len(planted_ids) >= 0.9, hits
    # and on those twins LSH agrees with exact brute force
    brute = cosine_topk(emb, queries, k=1).toPandas()
    bm = dict(zip(brute["query_id"], brute["cand_id"]))
    for _, r in got.iterrows():
        if r["rank"] == 1:
            assert bm[r.query_id] == r.cand_id


def test_lsh_topk_multi_table_lifts_ordinary_neighbor_recall(spark):
    """OR-amplified multi-table LSH (n_tables=L) must make ~0.9-cosine
    cluster neighbors findable: a single 12-plane table's recall@10 on
    this corpus is ~0.03 (the documented near-exact-dup-only behavior);
    8 tables of 6 planes measured 0.91 and 16 tables 1.00 — assert a
    conservative 0.75 floor on the seeded corpus, and that n_tables
    leaves planted-twin exactness intact."""
    rng = np.random.default_rng(42)
    dim, n, nq, k = 64, 4000, 16, 10
    centers = rng.standard_normal((32, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 32, n)] + 0.25 * rng.standard_normal((n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb2.filter(F.col("vec_id") < nq)
    truth = cosine_topk(emb2, queries, k=k).toPandas()
    tset = set(zip(truth.query_id, truth.cand_id))
    got = lsh_topk(
        emb2, queries, k=k, n_planes=6, dim=dim, n_tables=8
    ).toPandas()
    hits = sum((q, c) in tset for q, c in zip(got.query_id, got.cand_id))
    assert hits / len(tset) >= 0.75, hits / len(tset)


def test_lsh_topk_multi_table_keeps_planted_twins_exact(spark, emb):
    """The near-exact-dup contract must survive OR-amplification: with
    n_tables=4 every planted cosine~0.998 twin still lands at rank 1
    and matches brute force."""
    planted_ids = list(range(6, 120, 6))
    queries = emb.filter(F.col("vec_id").isin(planted_ids))
    got = lsh_topk(emb, queries, k=1, n_planes=10, n_tables=4).toPandas()
    hits = sum(
        1
        for _, r in got.iterrows()
        if r["rank"] == 1 and r.cand_id == r.query_id - 1
    )
    assert hits / len(planted_ids) >= 0.9, hits


def test_embedding_near_dup_pairs_find_planted(spark, emb):
    out = embedding_near_dup_pairs(emb, threshold=0.95, n_planes=8).toPandas()
    planted = {(i - 1, i) for i in range(6, 120, 6)}
    got = set(zip(out["id_a"], out["id_b"]))
    assert len(planted & got) / len(planted) >= 0.7


def test_ivf_topk_planted_and_recall(spark, emb):
    """IVF ANN: (a) an exact twin of each query must surface at rank 1
    with cosine exactly 1.0 (the query's own cell is always probed);
    (b) for the planted perturbed pairs, IVF agrees with exact brute
    force at rank 1 with high recall."""
    from rosreestr_xml_to_gis_converter_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    cents = ivf_centroids(emb, n_cells=6, seed=3, max_iter=4)
    assert cents.shape == (6, 32)

    # (a) planted exact twins
    twins = emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    both = emb.select("vec_id", "embedding").unionByName(twins)
    queries = both.filter(F.col("vec_id") < 5)
    got = ivf_topk(both, queries, k=1, centroids=cents, nprobe=1).toPandas()
    assert len(got) == 5
    for _, r in got.iterrows():
        assert r["rank"] == 1 and r.cand_id == r.query_id + 1000
        assert r.cosine == 1.0

    # (b) perturbed-pair recall vs brute force
    from rosreestr_xml_to_gis_converter_spark.operators.similarity import cosine_topk

    planted_ids = list(range(6, 120, 6))
    q2 = emb.filter(F.col("vec_id").isin(planted_ids))
    ivf = ivf_topk(emb, q2, k=1, centroids=cents, nprobe=3).toPandas()
    brute = cosine_topk(emb, q2, k=1).toPandas()
    bm = dict(zip(brute["query_id"], brute["cand_id"]))
    hits = sum(1 for _, r in ivf.iterrows() if r["rank"] == 1 and bm[r.query_id] == r.cand_id)
    assert hits / len(planted_ids) >= 0.9, hits


def test_embedding_banded_recall_and_exact_twins(spark, emb):
    """OR-amplified (banded) sign-LSH: (a) exact twins still collide in
    every band; (b) banded recall on the planted perturbed pairs is at
    least the full-signature recall (banding can only add candidates)."""
    full = embedding_near_dup_pairs(emb, threshold=0.95, n_planes=12).toPandas()
    banded = embedding_near_dup_pairs(
        emb, threshold=0.95, n_planes=12, bands=3
    ).toPandas()
    fp = set(zip(full["id_a"], full["id_b"]))
    bp = set(zip(banded["id_a"], banded["id_b"]))
    assert fp <= bp  # OR-amplification is a superset
    planted = {(i - 1, i) for i in range(6, 120, 6)}
    assert len(bp & planted) >= len(fp & planted)
    assert len(bp & planted) / len(planted) >= 0.9
    # exact twins: every planted pair must surface under banding
    twins = emb.select((F.col("vec_id") + 500).alias("vec_id"), "embedding")
    both = emb.select("vec_id", "embedding").unionByName(twins)
    got = embedding_near_dup_pairs(both, threshold=0.99, n_planes=12, bands=4).toPandas()
    tw = {(i, i + 500) for i in range(120)}
    found = set(zip(got["id_a"], got["id_b"]))
    assert tw <= found


def test_embedding_banding_remainder_and_validation(spark):
    """bands that do not divide n_planes distribute the remainder bits
    (no sign bit silently dropped); bands outside [2, n_planes] raise
    instead of degenerating into a cross join (round-3 ADVICE)."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from rosreestr_xml_to_gis_converter_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 16)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(20)]
    rows += [(100 + i, base[i].tolist()) for i in range(5)]  # exact twins
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    got = embedding_near_dup_pairs(
        emb, threshold=0.999, n_planes=12, bands=5, dim=16
    ).toPandas()
    twin_pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    for i in range(5):
        assert (i, 100 + i) in twin_pairs  # exact twins collide in every band
    with _pytest.raises(ValueError):
        embedding_near_dup_pairs(emb, n_planes=12, bands=13, dim=16)
    with _pytest.raises(ValueError):
        embedding_near_dup_pairs(emb, n_planes=12, bands=1, dim=16)


def test_hamming_near_pairs_recall_and_validation(spark):
    """Banded hamming search over an existing fingerprint column: with
    max_hamming+1 bands the pigeonhole guarantees EVERY pair within the
    radius is found (planted flips at each distance 0..7); beyond the
    radius nothing is emitted; invalid band counts raise."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        hamming_near_pairs,
    )

    rng = np.random.default_rng(77)
    base = rng.integers(-(2**63), 2**63 - 1, 40, dtype=np.int64)
    rows = [(f"b{i:02d}", int(h)) for i, h in enumerate(base)]
    # twin of b_i at hamming distance i % 8 (flip i%8 SPREAD bits so the
    # flips cross band boundaries, not just the low chunk)
    for i, h in enumerate(base):
        d = i % 8
        m = 0
        for j in range(d):
            m |= 1 << ((j * 13 + i) % 64)
        if m >= 1 << 63:
            m -= 1 << 64  # to signed-64 range before the numpy xor
        rows.append((f"t{i:02d}", int(np.int64(h) ^ np.int64(m))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "h"]))
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_near_pairs(df, max_hamming=4).collect()
    }
    for i in range(40):
        d = i % 8
        key = (f"b{i:02d}", f"t{i:02d}")
        if d <= 4:
            assert got.get(key) == d, (key, d, got.get(key))
        else:
            assert key not in got
    # organic pairs among 40 random 64-bit values at radius 4: none
    assert all(a[0] == "b" and b[0] == "t" for a, b in got)
    with _pytest.raises(ValueError):
        hamming_near_pairs(df, max_hamming=4, n_bands=3)  # < pigeonhole
    with _pytest.raises(ValueError):
        hamming_near_pairs(df, max_hamming=4, n_bands=65)


def test_hamming_near_pairs_matches_bruteforce(spark):
    """Randomized parity: the banded join must return EXACTLY the pairs a
    brute-force O(n^2) scan finds within the radius (pigeonhole recall is
    a guarantee, not a probability — so equality, not containment)."""
    import itertools

    import numpy as np
    import pandas as pd

    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        hamming_near_pairs,
    )

    rng = np.random.default_rng(20260817)
    # cluster structure so close pairs actually exist: a few seeds, many
    # low-weight perturbations of each
    seeds = rng.integers(-(2**62), 2**62, 6, dtype=np.int64)
    rows = []
    i = 0
    for s in seeds:
        for _ in range(8):
            m = 0
            for b in rng.choice(64, size=int(rng.integers(0, 7)), replace=False):
                m |= 1 << int(b)
            if m >= 1 << 63:
                m -= 1 << 64
            rows.append((f"v{i:03d}", int(np.int64(s) ^ np.int64(m))))
            i += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "h"]))
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_near_pairs(df, max_hamming=5).collect()
    }
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
        if d <= 5:
            key = (ia, ib) if ia < ib else (ib, ia)
            want[key] = d
    assert got == want and len(want) > 20  # non-trivial pair count


def test_hamming_combinatorial_banding_matches_bruteforce(spark):
    """Round 5: combinatorial banding (chunks_per_band > 1) — the scale
    configuration for 10^7+-row corpora — must return EXACTLY the brute
    force pairs whenever n_bands - max_hamming >= chunks_per_band, and
    reject configurations that void the pigeonhole guarantee."""
    import itertools

    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        hamming_near_pairs,
    )

    rng = np.random.default_rng(55)
    seeds = rng.integers(-(2**62), 2**62, 5, dtype=np.int64)
    rows = []
    i = 0
    for s in seeds:
        for _ in range(8):
            m = 0
            for b in rng.choice(64, size=int(rng.integers(0, 7)), replace=False):
                m |= 1 << int(b)
            if m >= 1 << 63:
                m -= 1 << 64
            rows.append((f"v{i:03d}", int(np.int64(s) ^ np.int64(m))))
            i += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "h"]))
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
        if d <= 4:
            key = (ia, ib) if ia < ib else (ib, ia)
            want[key] = d
    for n_bands, m in [(8, 4), (8, 2), (6, 2), (7, 3)]:
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in hamming_near_pairs(
                df, max_hamming=4, n_bands=n_bands, chunks_per_band=m
            ).collect()
        }
        assert got == want, (n_bands, m)
    assert len(want) > 15
    # n_bands - max_hamming < chunks_per_band -> no clean combination
    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_pairs(df, max_hamming=4, n_bands=6, chunks_per_band=3)
    with _pytest.raises(ValueError, match="chunks_per_band"):
        hamming_near_pairs(df, max_hamming=4, n_bands=8, chunks_per_band=9)


def test_connected_components_matches_union_find(spark):
    """Random sparse graphs: pointer-jumping min-label propagation must
    match a sequential union-find exactly, including on path graphs
    where transitivity does all the work."""
    import numpy as np
    import pandas as pd

    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        connected_components,
    )

    rng = np.random.default_rng(77)
    cases = []
    # random sparse graph
    n = 120
    edges = [(f"n{a:03d}", f"n{b:03d}")
             for a, b in rng.integers(0, n, (90, 2)) if a != b]
    cases.append(edges)
    # adversarial path graph (diameter = n-1): plain neighbor
    # propagation needs ~60 rounds, pointer jumping ~log2(60)
    cases.append([(f"p{i:03d}", f"p{i+1:03d}") for i in range(60)])
    # two rings + an isolated pair
    ring = [(f"r{i}", f"r{(i+1) % 10}") for i in range(10)]
    cases.append(ring + [("x1", "x2")])
    for edges in cases:
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["id_a", "id_b"])
        )
        # default max_iter: a 90-edge random forest takes ~14 rounds
        # (min-propagation + jumping is O(log n) with a real constant)
        got = {
            r.id: r.component
            for r in connected_components(df).collect()
        }
        assert got == want


def test_connected_components_nonconvergence_guard(spark):
    import pandas as pd
    import pytest as _pytest

    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        connected_components,
    )

    edges = [(f"q{i:02d}", f"q{i+1:02d}") for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=1)


def test_connected_components_releases_round_checkpoints(spark):
    """Round-6: superseded per-round label checkpoints (and the symmetric
    edge list) must be unpersisted — a 10^9-edge run would otherwise pin
    one full labels RDD per iteration for the rest of the job.  Only the
    FINAL labels frame may keep its blocks."""
    import pandas as pd

    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        connected_components,
    )

    def n_persistent():
        return len(spark._jsc.sc().getRDDStorageInfo())

    before = n_persistent()
    # a 16-node path graph needs several pointer-jumping rounds
    edges = [(f"p{i:02d}", f"p{i+1:02d}") for i in range(15)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    out = connected_components(df)
    assert out.count() == 16
    assert n_persistent() <= before + 1  # final labels only


def test_with_rights_strings_rejects_temp_collisions(spark):
    """Round-6 (round-5 ADVICE): an input column named like a staging
    temp would be clobbered and then kept by the temp-drop rule."""
    import pytest as _pytest

    from rosreestr_xml_to_gis_converter_spark.operators.attrs import (
        with_rights_strings,
    )

    df = spark.sql(
        "SELECT 'd1' AS doc_id, "
        "CAST(NULL AS array<struct<right_type:string,owner:string>>) AS rights, "
        "CAST(NULL AS array<struct<enc_type:string,holder:string>>) AS encumbrances, "
        "1 AS _w_rights"
    )
    with _pytest.raises(ValueError, match="_w_"):
        with_rights_strings(df)
