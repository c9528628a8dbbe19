"""Document deduplication family for training-data pipelines.

The reference has no dedup at all (SURVEY.md §2.1); these operators are
the lake-side dedup suite a 100 TB corpus needs. All are pure
DataFrame compositions — shuffles are on content-derived keys (hash,
shingle, band, bucket), so each scales horizontally; nothing collects
to the driver.

- exact_text_dedup:    sha256(normalized text) group — one shuffle.
- ngram_jaccard_pairs: shingle → explode → self-join on shingle →
                       per-pair intersection counts → Jaccard. The
                       candidate join is the classic inverted-index
                       join; frequent-shingle blowup is capped by
                       dropping shingles above a document-frequency
                       ceiling (standard prefix-filtering trick).
- minhash_lsh_pairs:   k seeded xxhash64 "permutations" → b bands ×
                       r rows → band-bucket join → verify Jaccard.
                       At scale only the band join shuffles, and each
                       bucket is tiny w.h.p.
- simhash64:           64-bit SimHash from token hashes via bit-vote
                       aggregation — expressed with aggregate() over
                       bit positions, stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_tokens(text_col: str = "text"):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def exact_text_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: canonical keeper = min
    doc_id. Output one row per distinct content with the copy count."""
    # null text stays a NULL sha: concat_ws would fold a null array to ''
    # (the empty-string document's hash) on the Spark side only — SQL
    # engines propagate NULL through sha256, so the two engines would
    # group null-text docs differently. GROUP BY treats NULLs as one
    # group in both Spark and ANSI SQL, so null docs form their own group.
    norm = F.when(
        F.col(text_col).isNotNull(),
        F.sha2(F.concat_ws(" ", normalized_tokens(text_col)), 256),
    )
    return (
        _spread(df).select(F.col("doc_id"), norm.alias("text_sha"))
        .groupBy("text_sha")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def shingle_array(text_col: str = "text", n: int = 3):
    """Array of n-token shingles (with duplicates) as a column expr.

    Kept for composability in pure-SQL plans, but NOT the hot path:
    Catalyst's higher-order functions (transform/slice/filter) execute
    INTERPRETED, outside whole-stage codegen — measured 8× slower than
    the Arrow-batched kernel below on the sandbox corpus. Operators use
    :func:`shingle_rows` / :func:`shingle_sets` instead."""
    toks = normalized_tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    # slice+array_join: one bounded array copy per shingle — measured 3x
    # faster than n F.get() element lookups per position. slice is
    # 1-based and clamps at the end, so short documents yield their
    # full-text shingle (same semantics as the SQL oracle's CASE).
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.filter(sh, lambda s: s != "")


def _shingle_list(text, n: int, ws) -> list[str]:
    """Python twin of shingle_array — byte-parity demands replicating
    Spark's exact semantics, not Python idiom:
      - `trim` strips SPACES ONLY (0x20), so leading/trailing \\t \\n \\r
        survive into the split — use .strip(' '), NOT .strip();
      - Spark `split(.., limit=-1)` keeps the leading/trailing EMPTY
        tokens a boundary delimiter produces, exactly like re.split —
        so a text ending in '\\n' contributes a trailing '' token and a
        'world foo ' shingle, same as the expression path and oracles;
      - \\s is the ASCII class in Java regex — re.ASCII matches it.
    Pinned by tests (incl. leading/trailing whitespace cases) and the
    DuckDB oracles."""
    if text is None:
        return []
    toks = ws.split(text.lower().strip(" "))
    if len(toks) <= n:
        out = [" ".join(toks)]
    else:
        out = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [s for s in out if s]


def shingle_rows(
    df: DataFrame, text_col: str = "text", n: int = 3, distinct: bool = True
) -> DataFrame:
    """(doc_id, n_sh, shingle) rows via one Arrow-batched pass — the hot
    shingle path (8× the interpreted higher-order-function expression).
    ``n_sh`` is the per-document shingle count under the same
    distinctness as the emitted rows. Documents with no shingles are
    absent (mirrors the expression path's size>0 filter)."""
    import re

    import pandas as pd

    def kernel(batches):
        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            ids: list = []
            sizes: list = []
            shingles: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                ss = _shingle_list(text, n, ws)
                if not ss:
                    continue
                if distinct:
                    ss = sorted(set(ss))
                ids.extend([doc_id] * len(ss))
                sizes.extend([len(ss)] * len(ss))
                shingles.extend(ss)
            yield pd.DataFrame({"doc_id": ids, "n_sh": sizes, "shingle": shingles})

    return _spread(df).select("doc_id", text_col).mapInPandas(
        kernel, "doc_id long, n_sh int, shingle string"
    )


def shingle_sets(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, sh_set) with the distinct shingles as a SORTED array —
    the Arrow-batched source for verify stages that need whole-document
    sets (array_intersect/array_union)."""
    import re

    import pandas as pd

    def kernel(batches):
        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            ids: list = []
            sets: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                ss = sorted(set(_shingle_list(text, n, ws)))
                if not ss:
                    continue
                ids.append(doc_id)
                sets.append(ss)
            yield pd.DataFrame({"doc_id": ids, "sh_set": sets})

    return _spread(df).select("doc_id", text_col).mapInPandas(
        kernel, "doc_id long, sh_set array<string>"
    )


def _spread(df: DataFrame) -> DataFrame:
    """Small corpora often arrive as one parquet file = ONE partition,
    serializing every per-row expression behind a single task. Fan the
    rows across the cluster before CPU-heavy shingling; no-op cost at
    scale (inputs there already have many splits)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs — distinct n-token shingles per document."""
    return shingle_rows(df, text_col, n, distinct=True).select("doc_id", "shingle")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Candidate pairs via inverted-index self-join on shingles, scored
    by exact Jaccard. ``max_shingle_df`` drops ubiquitous shingles
    before the join (prefix filtering) — without it one stop-shingle
    shared by every document makes the join quadratic."""
    # shingle each document ONCE (Arrow-batched kernel); the inverted
    # index rows carry the per-doc sizes along. localCheckpoint(eager):
    # the frame feeds THREE consumers (the document-frequency aggregate
    # and both self-join sides) — without the materialization the
    # Python shingling kernel re-runs once per consumer (guide §4: the
    # JVM↔Python crossing is the expensive part; measured 3x the kernel
    # cost per call). A checkpoint, not persist(): CacheManager would
    # match the identical plan across separate calls and silently serve
    # a later invocation from memory — cross-run result caching the
    # bench must not see.
    sh = shingle_rows(df, text_col, n, distinct=True).localCheckpoint(eager=True)
    joinable = sh
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(rare, "shingle")
    a = joinable.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"), "shingle")
    b = joinable.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n: int = 3, k: int = 32, seed: int = 42
) -> DataFrame:
    """k-permutation MinHash signature per document: min over shingles of
    xxhash64(shingle, perm_seed). One explode + one groupBy."""
    sh = shingles(df, text_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"mh_{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def _band_buckets_from_sets(
    sets: DataFrame, k: int, bands: int, seed: int, hash_fn: str
) -> DataFrame:
    """(doc_id, band, bucket) LSH band buckets from (doc_id, sh_set)
    rows. Factored out of minhash_lsh_pairs so the incremental shard
    refresh can probe a STORED bucket sidecar with only the changed
    docs' buckets (O(delta) candidate generation) — bands are a pure
    function of the text, so stored and recomputed buckets agree."""
    if k % bands != 0:
        # a bare assert would vanish under python -O and silently leave
        # k % bands signature columns out of every band (recall loss)
        raise ValueError(f"k={k} must be divisible by bands={bands}")
    r = k // bands
    sh = sets.select("doc_id", F.explode("sh_set").alias("shingle"))
    if hash_fn == "sha":
        mins = [
            F.min(
                F.substring(F.sha2(F.concat(F.lit(f"{i}|"), F.col("shingle")), 256), 1, 16)
            ).alias(f"mh_{i}")
            for i in range(k)
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"mh_{i}")
            for i in range(k)
        ]
    sig = sh.groupBy("doc_id").agg(*mins)
    if hash_fn == "sha":
        band_cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)]).alias("bucket"),
            )
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.struct(F.lit(b).alias("band"), F.xxhash64(*[F.col(f"mh_{b * r + j}") for j in range(r)]).cast("string").alias("bucket"))
            for b in range(bands)
        ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Public band-bucket emission for sidecar storage (plans/export.py
    near-dup stage): (doc_id, band, bucket:string)."""
    return _band_buckets_from_sets(
        shingle_sets(df, text_col, n), k=k, bands=bands, seed=seed, hash_fn=hash_fn
    )


def verify_jaccard_pairs(
    cand: DataFrame, docs: DataFrame, text_col: str = "text", n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against the documents' shingle sets — the shared verify stage of
    minhash_lsh_pairs, exposed for incremental refresh (which verifies
    candidates against a DELTA-sized doc set, not the corpus)."""
    # both join sides read the same sets — checkpoint so the shingling
    # kernel runs once (localCheckpoint, not persist — see
    # ngram_jaccard_pairs)
    sets = shingle_sets(docs, text_col, n).localCheckpoint(eager=True)
    a_sets = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    b_sets = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.size(F.array_union(F.col("set_a"), F.col("set_b")))
    return (
        cand.join(a_sets, "doc_a")
        .join(b_sets, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become
    candidates; candidates are verified with exact Jaccard (no false
    positives in the output; recall governed by (b, r)).

    Verification joins each candidate pair to the two docs' distinct-
    shingle ARRAYS and scores with array_intersect/array_union —
    proportional to candidate count, not to the corpus-wide inverted
    index (candidates are the rare case by construction).

    ``hash_fn``: 'xxhash64' (default — the fast JVM hash) or 'sha'
    (sha256-prefix permutations, engine-portable: DuckDB computes the
    identical signatures, making the WHOLE pipeline — signatures, band
    buckets, surviving pairs — oracle-checkable end to end; ~3× slower,
    so the fast path stays default)."""
    # sets feed the band-bucket aggregation AND both verify-join sides;
    # buckets feed both candidate-join sides. Checkpoint each once so
    # the Arrow shingling kernel runs ONE time and the k-permutation
    # signature aggregate ONE time instead of once per consumer
    # (localCheckpoint, not persist — see ngram_jaccard_pairs).
    sets = shingle_sets(df, text_col, n).localCheckpoint(eager=True)
    buckets = _band_buckets_from_sets(
        sets, k=k, bands=bands, seed=seed, hash_fn=hash_fn
    ).localCheckpoint(eager=True)
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    a_sets = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    b_sets = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.size(F.array_union(F.col("set_a"), F.col("set_b")))
    return (
        cand.join(a_sets, "doc_a")
        .join(b_sets, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "text", hash_fn: str = "xxhash") -> DataFrame:
    """64-bit SimHash: per bit position, sum votes (+1 if token hash has
    the bit set, else -1) over all tokens; bit = 1 when the vote is
    positive. Vectorized as explode → per-bit conditional sums.

    ``hash_fn='sha'`` votes over a 60-bit sha256-prefix token hash
    instead of xxhash64 — 15 hex digits fit a signed long exactly, and
    a SQL engine computes the identical hash, making the whole SimHash
    pipeline oracle-checkable (the minhash-sha precedent)."""
    width = 60 if hash_fn == "sha" else 64
    toks = _spread(df).select(
        "doc_id", F.explode(normalized_tokens(text_col)).alias("tok")
    )
    if hash_fn == "sha":
        toks = toks.withColumn(
            "h", F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 15), 16, 10).cast("long")
        )
    else:
        toks = toks.withColumn("h", F.xxhash64("tok"))
    # shiftleft keeps the bit mask in JVM long space (1 << 63 would
    # overflow a Python-literal lit)
    votes = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1
            ).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(width)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(width):
        bit = F.when(
            F.col(f"v_{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3, hash_fn: str = "xxhash"
) -> DataFrame:
    """Near-dup pairs by SimHash with a RECALL GUARANTEE: block on
    ``max_hamming + 1`` bit chunks — by pigeonhole, a pair within Hamming
    distance ``max_hamming`` has at most that many differing bits, so at
    least one of the max_hamming+1 chunks is identical on both sides.
    Candidates from the chunk-equi join are verified with exact
    bit_count(xor). Wider radii mean narrower chunks (bigger buckets,
    more candidates) — the correct recall/cost trade, chosen here by the
    radius instead of silently losing pairs beyond a fixed 4-chunk split."""
    width = 60 if hash_fn == "sha" else 64
    n_chunks = min(max(max_hamming + 1, 2), width)
    base, rem = divmod(width, n_chunks)
    widths = [base + 1 if i < rem else base for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    # the chunk frame self-joins: checkpoint it so the 60/64-way
    # bit-vote aggregation runs once, not once per join side
    # (localCheckpoint, not persist — see ngram_jaccard_pairs).
    sig = simhash64(df, text_col, hash_fn)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1).cast("long"))
                        .alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(
        "doc_id", "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk")
    ).localCheckpoint(eager=True)
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk_id", "chunk"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.withColumn("hamming", ham).filter(ham <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )
