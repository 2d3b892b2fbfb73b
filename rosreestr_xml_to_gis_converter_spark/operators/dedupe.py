"""Large-scale deduplication operators over a document corpus.

Everything stays JVM-side: shingling, hashing (``xxhash64``), minhash,
banding, and verification are Column expressions / higher-order array
functions — no Python UDFs, so these run at full codegen speed over
10^12-row corpora.  The LSH self-joins are equi-joins on (band, hash)
buckets, which Catalyst shuffles on the bucket key (the standard
MinHash-LSH dedup shape used by web-scale corpus pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column (JVM higher-order fns).

    The word array is bound to a LAMBDA VARIABLE (via a single-element
    array + transform) before the per-shingle ``element_at`` accesses:
    referencing the raw ``split(lower(text))`` expression inside the
    shingle lambda re-evaluates the split per element access — ~3k
    split+lower calls per document — because Catalyst's subexpression
    elimination does not hoist out of higher-order lambdas (measured:
    50k docs shingled in ~1 s this way vs ~72 s with the naive form;
    the emitted shingle values are identical)."""

    def shingles_of(w: Column) -> Column:
        n = F.size(w) - (k - 1)
        mk = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
        )
        return F.array_distinct(
            F.when(n >= 1, mk).otherwise(F.array().cast("array<string>"))
        )

    return F.element_at(F.transform(F.array(_words(text)), shingles_of), 1)


def spread_input(df: DataFrame) -> DataFrame:
    """Scale-adaptive input-skew guard (guide §2.5): a small parquet with
    one row group hands ALL its rows to a single scan task no matter what
    ``maxPartitionBytes`` says — the byte-range split count looks healthy
    while every row lands in the one split holding the row-group start —
    serializing every downstream expression (measured: the 50k-doc
    shingle+minhash build ran ~82 s on one core vs ~3 s spread).  The
    partition COUNT therefore can't detect it; gate on the optimizer's
    size estimate instead: anything smaller than one healthy task-wave
    (parallelism x 64 MB) is repartitioned round-robin — a sub-GB
    exchange, trivially cheap — while a production-scale table with many
    row groups skips the extra shuffle entirely."""
    if _should_spread(df):
        return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df


def spread_input_by(df: DataFrame, *cols: str) -> DataFrame:
    """:func:`spread_input` variant that hash-partitions on ``cols``
    instead of round-robin: skips the keyless repartition's
    sort-before-repartition pass (guide §2.5), stays deterministic under
    task retry, and — when ``cols`` are the keys of a downstream
    dedup/groupBy — lets that operator reuse the exchange outright
    (guide §2.4)."""
    if _should_spread(df):
        return df.repartition(
            df.sparkSession.sparkContext.defaultParallelism,
            *[F.col(c) for c in cols],
        )
    return df


def _should_spread(df: DataFrame) -> bool:
    """Spread only when it can actually pay:

    * size band — above one healthy task-wave (parallelism x 64 MB) the
      shuffle would be waste and production tables are laid out anyway;
      below parallelism x 64 KB the job is over in one small task and
      the exchange's fixed cost (~0.1-0.2 s) dominates (measured:
      spreading the sf0.1 events/embeddings scans cost +0.1-0.15 s net);
    * the scan must be GENUINELY starved — parquet footers are checked
      driver-side and the spread fires only when the total row-group
      count is below the core count (the byte-range split COUNT lies: a
      single-row-group file yields hundreds of "splits" with all rows in
      one of them).  A well-laid-out input (e.g. the scaling bench's
      64-partition materialized table) is never repartitioned — the
      spread may only ADD effective parallelism, never reshape a healthy
      layout;
    * non-file relations (createDataFrame/range) are already evenly
      sliced across cores — never spread.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if not (parallelism * 64 * 1024 <= size < parallelism * 64 * 1024 * 1024):
        return False
    files = df.inputFiles()
    if not files or len(files) >= parallelism:
        return False
    try:
        from urllib.parse import unquote, urlparse

        import pyarrow.parquet as pq

        row_groups = 0
        for f in files:
            p = urlparse(f)
            path = unquote(p.path) if p.scheme in ("file", "") else None
            if path is None:
                # remote storage: footers not cheaply reachable here;
                # the size band already says the input is small
                return True
            row_groups += pq.ParquetFile(path).num_row_groups
            if row_groups >= parallelism:
                return False
        return row_groups < parallelism
    except Exception:
        return True  # unreadable footer (non-parquet): trust the size band


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash (hash-groupBy)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_distinct(F.concat(a, b)))
    return inter.cast("double") / union.cast("double")


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs n-gram Jaccard (exact, quadratic) — the small-N oracle
    baseline; MinHash-LSH below is the scale path with the same verify."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh")
    ).cache()  # both self-join sides reuse the shingled relation
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(shingles: Column, n_hashes: int) -> Column:
    """n independent minhashes via seeded xxhash64 — array<long>."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))) for i in range(n_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH candidate generation + exact Jaccard verify.

    shingle -> minhash(n) -> band buckets (bands x rows) -> bucket
    self-join -> verify.  Only bucket-colliding pairs are verified, so
    cost is ~linear in corpus size for realistic duplicate rates.
    """
    rows = n_hashes // bands
    sh = (
        spread_input(df)
        .select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), k).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .cache()
    )
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    # SLIM band rows (round-6 optimization, guide §2.3/§8): the bucket
    # self-join carries only (id, band, bucket) — the earlier realization
    # shipped every doc's full shingle array `bands`x through the join's
    # build side (~1 KB/row at 8 copies per doc), which dominated the
    # query; shingles are re-attached below to the (tiny) surviving
    # candidate-pair set only.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.element_at("sig", b * rows + r + 1) for r in range(rows)]).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket").cache()
    # caches: the bucket self-join would otherwise recompute the full
    # shingle->minhash->band pipeline for BOTH sides, and the verify
    # joins would re-shingle (at scale: persist the signature table once,
    # join from there)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # re-attach shingles to candidates only; AQE turns these into
    # broadcast joins of the candidate side at realistic duplicate rates
    # (candidates << corpus), so the cached shingle relation is streamed,
    # never shuffled
    cand = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    return (
        cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text: Column, n_bits: int = 64) -> Column:
    """SimHash over word tokens, pure Column arithmetic.

    For each bit b: vote = sum over tokens of +-1 by the b-th bit of
    xxhash64(token); bit set iff vote > 0.  Assembled into a long.
    """
    words = F.array_distinct(_words(text))

    # bind the token-hash array to a lambda variable before the 64
    # per-bit aggregates: referencing the raw transform expression in
    # each aggregate re-runs split+distinct+hash 64x per row (the same
    # higher-order-lambda duplication fixed in word_shingles; emitted
    # fingerprints are identical)
    def assemble(hashes: Column) -> Column:
        def bit_vote(b: int) -> Column:
            votes = F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            return F.when(votes > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )

        out = F.lit(0).cast("long")
        for b in range(n_bits):
            # bit 63 is the sign bit of a signed long: setting it == adding
            # -2^63 (1 << 63 itself overflows a long literal)
            weight = (
                F.lit(-(1 << 63)).cast("long") if b == 63 else F.lit(1 << b).cast("long")
            )
            out = out + bit_vote(b) * weight
        return out

    return F.element_at(
        F.transform(
            F.array(F.transform(words, lambda w: F.xxhash64(w))), assemble
        ),
        1,
    )


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    16-bit chunks (pigeonhole: hamming<=3 guarantees a chunk collides;
    larger radii are still found with high probability), bucket-join,
    verify exact hamming distance with bit_count."""
    s = spread_input(df).select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh")
    )
    chunks = s.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sh", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "sh", "cc.chunk", "cc.key")
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        # bit_count verify BEFORE the dedup exchange (same reasoning as
        # hamming_near_pairs: hamming is band-independent, the filter
        # shrinks the shuffle from candidates to answers)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _banded_chunks(
    df: DataFrame,
    max_hamming: int,
    id_col: str,
    hash_col: str,
    n_bits: int,
    n_bands: int | None,
    chunks_per_band: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """The banded-hamming chunking shared by the self-join
    (:func:`hamming_near_pairs`) and the stream-static matcher
    (:func:`hamming_match_static`): validate the (n_bands,
    chunks_per_band) pigeonhole recall guarantee, split the fingerprint
    into remainder-distributed chunks, and explode each row to one
    (band, key) per chunk combination.  ``carry`` columns pass through
    unchanged (e.g. an event-time column for streaming watermarks).
    Keeping this in ONE place means the two join shapes can never key
    on different chunk layouts."""
    from itertools import combinations

    n_bands = max_hamming + 1 if n_bands is None else n_bands
    if not 1 <= n_bands <= n_bits:
        raise ValueError(f"n_bands must be in [1, {n_bits}], got {n_bands}")
    if not 1 <= chunks_per_band <= n_bands:
        raise ValueError(
            f"chunks_per_band must be in [1, {n_bands}], got {chunks_per_band}"
        )
    if n_bands - max_hamming < chunks_per_band:
        raise ValueError(
            f"n_bands={n_bands}, chunks_per_band={chunks_per_band} cannot "
            f"guarantee recall at hamming {max_hamming} (pigeonhole needs "
            f"n_bands - max_hamming >= chunks_per_band)"
        )
    width = n_bits // n_bands
    widths = [width + (1 if i < n_bits % n_bands else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    if sum(widths[:chunks_per_band]) > 63:
        raise ValueError("combined band key exceeds 63 bits; lower chunks_per_band")

    def chunk_expr(i):
        return F.shiftright("hh", offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))

    def band_key(combi):
        # pack the selected chunks into one long, widest-first shifts
        key = chunk_expr(combi[0])
        for i in combi[1:]:
            key = F.shiftleft(key, widths[i]) + chunk_expr(i)
        return key

    combis = list(combinations(range(n_bands), chunks_per_band))
    if len(combis) > 512:
        # C(n_bands, m) structs per row: beyond a few hundred the explode
        # factor (and the codegen'd expression tree) dominates any bucket
        # savings — useful configs sit at C <= ~100 (e.g. C(8,4)=70)
        raise ValueError(
            f"C({n_bands},{chunks_per_band}) = {len(combis)} band combinations; "
            "pick a config with <= 512 (explode factor = combination count)"
        )
    s = df.select(
        F.col(id_col).alias("id"), F.col(hash_col).cast("long").alias("hh"), *carry
    )
    return s.select(
        "id",
        "hh",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_key(c).alias("key"))
                    for b, c in enumerate(combis)
                ]
            )
        ).alias("bk"),
    ).select("id", "hh", *carry, "bk.band", "bk.key")


def hamming_match_static(
    probe: DataFrame,
    static: DataFrame,
    max_hamming: int,
    probe_id_col: str = "id",
    probe_hash_col: str = "h",
    static_id_col: str = "id",
    static_hash_col: str = "h",
    n_bits: int = 64,
    n_bands: int | None = None,
    chunks_per_band: int = 1,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Verified near-dup matches of ``probe`` rows against a STATIC
    fingerprint layer: both sides chunk through :func:`_banded_chunks`,
    equi-join on (band, key), ``bit_count(xor)`` verify — the
    continuous-ingestion shape of :func:`hamming_near_pairs`.  STATELESS
    by construction (no self-join, no dedup shuffle), so ``probe`` may
    be a Structured Streaming DataFrame: each micro-batch joins the
    static side with no state store, which is exactly how a 10^12-row
    corpus absorbs new documents — the static side is the bucketed
    signature table written once and reused per batch.

    A (probe, static) pair surfaces once per matching band combination;
    the caller collapses the multiplicity (``dropDuplicates`` in batch,
    or the watermarked per-probe aggregation in
    ``streaming/near_dup.py`` — ``collect_set`` absorbs it for free).
    ``carry`` columns from the probe side pass through (e.g. the event
    time a streaming watermark needs)."""
    pc = _banded_chunks(
        probe, max_hamming, probe_id_col, probe_hash_col,
        n_bits, n_bands, chunks_per_band, carry=carry,
    ).select(
        F.col("id").alias("probe_id"), F.col("hh").alias("_ph"),
        *carry, "band", "key",
    )
    sc = _banded_chunks(
        static, max_hamming, static_id_col, static_hash_col,
        n_bits, n_bands, chunks_per_band,
    ).select(
        F.col("id").alias("static_id"), F.col("hh").alias("_sh"), "band", "key"
    )
    return (
        pc.join(sc, ["band", "key"])
        .filter(F.col("probe_id") != F.col("static_id"))
        .select(
            "probe_id",
            "static_id",
            F.bit_count(F.col("_ph").bitwiseXOR(F.col("_sh"))).alias("hamming"),
            *carry,
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_near_pairs(
    df: DataFrame,
    max_hamming: int,
    id_col: str = "id",
    hash_col: str = "h",
    n_bits: int = 64,
    n_bands: int | None = None,
    chunks_per_band: int = 1,
) -> DataFrame:
    """Near-dup pairs over an EXISTING n-bit fingerprint column by banded
    hamming search: split the fingerprint into ``n_bands`` chunks
    (default ``max_hamming + 1`` — the pigeonhole count that GUARANTEES
    two hashes within the radius collide on at least one untouched
    chunk), equi-self-join on (band, chunk), verify the exact distance
    with ``bit_count(xor)``.  The join is a bucket join on chunk values,
    never all-pairs — the same 10^12-row shape as the MinHash/SimHash
    paths.  Remainder bits are distributed so no bit is dropped.

    ``chunks_per_band`` (round 5) is the SCALE knob the single-chunk
    layout lacks: with n_bands = max_hamming + 1 the band keys are only
    ~n_bits/(r+1) bits wide (13 for a 64-bit pHash at r=4), so on a
    near-uniform corpus the bucket join goes quadratic past ~10^6 rows
    (measured: 2e9 candidate pairs at 2M rows).  Combinatorial banding
    splits the hash into ``n_bands`` chunks and keys each band on a
    COMBINATION of ``chunks_per_band`` = m of them: within radius r at
    most r chunks differ, so a pair shares a fully-clean m-combination
    whenever n_bands - r >= m (validated below) — recall stays
    guaranteed while keys grow to m*(n_bits/n_bands) bits.  E.g.
    (n_bands=8, m=4) gives C(8,4)=70 bands of 32-bit keys: candidate
    volume drops by ~2^19 per band pair while the explode factor rises
    14x — the right trade at 10^8+ rows.
    """
    chunks = _banded_chunks(
        df, max_hamming, id_col, hash_col, n_bits, n_bands, chunks_per_band
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.hh").bitwiseXOR(F.col("b.hh"))).alias("hamming"),
        )
        # verify BEFORE the dedup shuffle: hamming is a function of the
        # pair alone (not of which band matched), so filtering first is
        # semantically identical and shrinks the dropDuplicates exchange
        # from every candidate pair to just the true near-dups (~20x on
        # a uniform corpus; the difference between a shuffle of the
        # candidate set and a shuffle of the answer at 10^8+ rows)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def phash_near_pairs(
    images: DataFrame,
    max_hamming: int = 4,
    id_col: str = "image_id",
    n_bands: int | None = None,
    chunks_per_band: int = 1,
) -> DataFrame:
    """Image near-duplicates by perceptual hash: the input table already
    carries a 64-bit ``phash`` (BASELINE input_hint), so near-dup
    detection is a pure fingerprint-banding join — no decode, no Python.
    Radius 4 is the usual pHash near-dup threshold.  For 10^7+-row
    corpora pass e.g. ``n_bands=8, chunks_per_band=4`` (combinatorial
    banding, 32-bit keys) — see :func:`hamming_near_pairs`."""
    return hamming_near_pairs(
        images, max_hamming, id_col=id_col, hash_col="phash",
        n_bands=n_bands, chunks_per_band=chunks_per_band,
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Near-dup CLUSTERS from a pair list: ``(id, component)`` where
    ``component`` is the minimum member id of the pair-connected group.

    This is the step that turns pair detection (MinHash / SimHash /
    pHash / embedding joins above) into actual deduplication: pick the
    canonical representative per component, drop the rest.  Transitivity
    matters — two documents can be near-dups of a shared middle document
    while exceeding the radius between themselves.

    Algorithm: min-label propagation WITH pointer jumping — each round
    every node takes the min of (its label, its neighbors' labels, its
    label's label).  The jump join halves label-chain depth per round,
    so convergence is O(log n) rounds even on adversarial path graphs
    (plain neighbor propagation is O(diameter)).  Each round is two
    shuffles on the label key; ``localCheckpoint`` keeps the lineage
    flat so round k does not recompute rounds 1..k-1 — the standard
    iterative-algorithm discipline at 10^9+-edge scale.  The fixpoint
    check is an existence probe (``limit(1)``), not a full count.
    """
    e = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["b"] == labels["node"]).select(
            sym["a"].alias("node"), labels["label"]
        )
        jump = (
            labels.alias("l1")
            .join(labels.alias("l2"), F.col("l1.label") == F.col("l2.node"))
            .select(F.col("l1.node").alias("node"), F.col("l2.label").alias("label"))
        )
        new = (
            labels.unionByName(nbr)
            .unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        # release the superseded round's checkpointed blocks (round-5
        # ADVICE): without this every iteration pins another full labels
        # RDD in executor storage for the rest of the run
        _unpersist_checkpoint(labels)
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    _unpersist_checkpoint(sym)
    return labels.select(F.col("node").alias("id"), F.col("label").alias("component"))


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a ``localCheckpoint``-ed frame.

    ``df.rdd.unpersist()`` silently does nothing here — ``.rdd`` wraps
    the plan in a NEW deserializing RDD; the persisted blocks belong to
    the LogicalRDD captured at checkpoint time, reachable through the
    analyzed plan (verified against ``getRDDStorageInfo``)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # best-effort: a non-checkpointed frame has no LogicalRDD
