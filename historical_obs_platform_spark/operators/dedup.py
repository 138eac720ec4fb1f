"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-disciplined for 100 TB corpora:

- **exact**: normalize → content fingerprint → hash-groupBy. One
  shuffle on the fingerprint; the canonical row per group is chosen
  deterministically (min id), so re-runs are stable.
- **MinHash + LSH**: shingle → K min-hashes → band → bucket-join.
  Candidate pairs are generated only within LSH buckets (band
  equality), never all-pairs; the exact Jaccard confirm runs on the
  candidate set.
- **n-gram Jaccard**: inverted-index join on shingles — pairs sharing
  ≥1 shingle — then |∩| / (|A|+|B|−|∩|). Quadratic only within
  shingle posting lists, not the corpus.
- **SimHash**: per-token hash bits summed (±1) per bit position; the
  sign vector packs into an integer; near-dups collide or differ in
  few bits.

Hashing is md5-based (hex-string domain) rather than engine-native
hash functions so every operator has a cross-engine-reproducible
definition (the DuckDB oracle computes the identical values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HEX = "0123456789abcdef"


def normalize_text(col) -> Column:
    """Canonical text form: lowercase, trim, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(col) -> Column:
    """Exact content fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized text — the minimum id
    (deterministic). Adds ``fingerprint``; drops the other copies."""
    fp = df.withColumn("fingerprint", fingerprint(text_col))
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toked = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("__toks")
    )
    if n == 1:
        sh = F.col("__toks")
    else:
        sh = F.when(
            F.size("__toks") >= n,
            F.expr(
                f"transform(sequence(1, size(__toks) - {n - 1}),"
                f" i -> concat_ws(' ', slice(__toks, i, {n})))"
            ),
        ).otherwise(F.array().cast("array<string>"))
    return (
        toked.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


# Each md5 yields 128 independent bits; a MinHash family only needs
# ~40 bits per hash (min over a document's shingles of a 2^40-space
# value — collision odds ~len(doc)²/2^40, negligible). Slicing three
# 10-hex-char (40-bit) values out of every md5 computes K independent
# hashes with ceil(K/3) md5 calls instead of K — same selectivity
# (independent uniform bits), ~2.7× cheaper signature pass. (A
# Kirsch–Mitzenmacher linear family h_i = v1 + i·v2 would need only
# 2 md5s, but correlates the per-hash argmin shingles: measured on
# the sf0.1 corpus it inflated LSH candidate pairs 6.6 k → 50 k,
# exactly the confirm-stage blowup banding exists to avoid.)
MINHASH_SLICE_HEX = 10  # 40 bits per hash
_SLICES_PER_MD5 = 3


def _minhash_md5_start(i: int) -> tuple[int, int]:
    """(md5 salt index, 1-based hex start) for hash i."""
    return i // _SLICES_PER_MD5, 1 + (i % _SLICES_PER_MD5) * MINHASH_SLICE_HEX


def minhash_hash_col(i: int) -> Column:
    """Spark column for hash i of the MinHash family over the
    ``shingle`` column: the (i mod 3)-th 40-bit slice of
    md5('mh<i div 3>:' || shingle), parsed with ``conv`` (a single
    codegen'd hex parse — per-nibble instr/substring arithmetic
    measured 5× slower here)."""
    m, start = _minhash_md5_start(i)
    h = F.md5(F.concat(F.lit(f"mh{m}:"), F.col("shingle")))
    return F.conv(
        F.substring(h, start, MINHASH_SLICE_HEX), 16, 10
    ).cast("long")


def minhash_hash_sql(i: int) -> str:
    """DuckDB SQL computing the identical value as
    ``minhash_hash_col(i)`` (DuckDB has no ``conv``; a '0x' hex-
    literal cast parses the same 40-bit slice)."""
    m, start = _minhash_md5_start(i)
    return (
        f"CAST('0x' || substring(md5('mh{m}:' || shingle),"
        f" {start}, {MINHASH_SLICE_HEX}) AS BIGINT)"
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, n_hashes: int = 8
) -> DataFrame:
    """K min-hashes per document: minhash_i = min over shingles of
    the i-th 40-bit md5-slice hash (see ``minhash_hash_col``). One
    aggregation computes all K minima; BIGINT min is cheaper
    aggregation state than the former 32-char hex-string min."""
    based = shingles.select(
        F.col(id_col),
        *[minhash_hash_col(i).alias(f"__h{i}") for i in range(n_hashes)],
    )
    aggs = [
        F.min(f"__h{i}").alias(f"minhash_{i}") for i in range(n_hashes)
    ]
    return based.groupBy(id_col).agg(*aggs)


def lsh_buckets(
    signatures: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """LSH banding: signature split into ``bands`` bands of
    ``n_hashes/bands`` rows; band key = md5 of the band's
    concatenated min-hashes. Returns (id, band, bucket)."""
    rows = n_hashes // bands
    parts = []
    for b in range(bands):
        cols = [F.col(f"minhash_{b * rows + r}") for r in range(rows)]
        parts.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lsh_candidate_pairs(
    buckets: DataFrame,
    id_col: str,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any LSH bucket —
    the self-join is on (band, bucket), so only collisions pair up.

    ``max_bucket_size`` is the skew guard for real corpora: a
    degenerate bucket of B docs emits B²/2 pairs (boilerplate or
    near-empty documents routinely produce buckets of millions), so
    production near-dup pipelines drop buckets above a cap before
    pairing — the standard recall trade (any pair inside a dropped
    mega-bucket is usually also caught by one of the other bands).
    None (the default) keeps every bucket, which is what the
    driver-facing queries use so their oracles stay closed-form.
    """
    if max_bucket_size is not None:
        sizes = buckets.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__sz")
        )
        buckets = (
            buckets.join(sizes, ["band", "bucket"])
            .where(F.col("__sz") <= max_bucket_size)
            .drop("__sz")
        )
    a = buckets.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("a")
    )
    b = buckets.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("b")
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str,
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
    doc_arrays: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for document pairs.

    Without ``candidates``, pairs come from the shingle inverted index
    (documents sharing ≥1 shingle) — correct but quadratic in posting-
    list length, so ONLY for small/diverse corpora. With ``candidates``
    (a, b) — normally the LSH bucket collisions — each document's
    distinct shingles are collected into ONE array row and the
    intersection is a per-pair ``array_intersect`` (hash-set probe,
    JVM codegen): work is |candidates| × (|A|+|B|) with no
    pair×shingle row blowup — the 2-sided expand-join form
    materialized |candidates| × shingles-per-doc rows (16 M at sf0.1)
    through a shuffle before re-grouping, ~4× slower and worse with
    density. Band-bucket join prunes, exact Jaccard confirms: the
    100 TB path.
    """
    if candidates is not None:
        # collect_set / countDistinct (not list/count): array_intersect
        # dedups n_common, so sz must count distinct shingles too or a
        # caller passing non-distinct (id, shingle) rows would silently
        # underestimate jaccard. ``doc_arrays`` lets a caller pass the
        # prebuilt (id, __sh, sz) table — both join legs otherwise
        # re-run this corpus-wide aggregation (plans are trees), and
        # the d_* family's consumers all confirm against the same
        # shared corpus (textops._lsh_doc_arrays_shared).
        if doc_arrays is None:
            doc_arrays = shingles.groupBy(id_col).agg(
                F.collect_set("shingle").alias("__sh"),
                F.countDistinct("shingle").alias("sz"),
            )
        else:
            doc_arrays = doc_arrays.select(
                F.col(id_col), F.col("__sh"), F.col("sz")
            )
        aa = doc_arrays.select(
            F.col(id_col).alias("a"),
            F.col("__sh").alias("__sh_a"),
            F.col("sz").alias("sz_a"),
        )
        bb = doc_arrays.select(
            F.col(id_col).alias("b"),
            F.col("__sh").alias("__sh_b"),
            F.col("sz").alias("sz_b"),
        )
        out = (
            candidates.join(aa, "a")
            .join(bb, "b")
            .withColumn(
                "n_common",
                F.size(F.array_intersect("__sh_a", "__sh_b")).cast("long"),
            )
            .where(F.col("n_common") > 0)
            .drop("__sh_a", "__sh_b")
        )
    else:
        sizes = shingles.groupBy(id_col).agg(
            F.countDistinct("shingle").alias("sz")
        )
        a = shingles.select(F.col(id_col).alias("a"), "shingle")
        b = shingles.select(F.col(id_col).alias("b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.countDistinct("shingle").alias("n_common"))
        )
        sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
        out = inter.join(sa, "a").join(sb, "b")
    out = out.withColumn(
        "jaccard",
        F.round(
            F.col("n_common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
            6,
        ),
    )
    return out.where(F.col("jaccard") >= min_jaccard).select(
        "a", "b", "n_common", "sz_a", "sz_b", "jaccard"
    )


def prefix_filter_candidates(
    shingles: DataFrame,
    id_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact (no-false-negative) candidate pairs for Jaccard >=
    ``threshold`` via prefix filtering (SSJoin/PPJoin, Chaudhuri et
    al. ICDE'06, Xiao et al. WWW'08): order every document's distinct
    shingles by the GLOBAL (document-frequency, shingle) key — rarest
    first, byte-wise tiebreak, identical in any engine — and keep
    only the first ``sz - ceil(t*sz) + 1`` as the document's prefix.
    The pigeonhole theorem guarantees two sets with Jaccard >= t
    share at least one PREFIX token, so the candidate join runs on
    prefixes only.

    Unlike MinHash-LSH banding this prunes with a PROOF, not a
    probability: recall is exactly 1.0 by construction (the test and
    the oracle assert candidate⊇truth by comparing the confirmed
    output against the unpruned all-pairs join). Two sound filters
    compose: the prefix collision (pigeonhole) and PPJoin's length
    filter — Jaccard >= t forces t <= |x|/|y| <= 1/t, applied inside
    the join condition so oversize/undersize pairs never leave the
    build side. Scale shape: the per-doc rank window partitions by
    document (no global sort — the (df, shingle) key is deterministic
    without one); the candidate join's fan-out is bounded by PREFIX
    posting lists, which the rarest-first order makes the shortest
    ones available.
    """
    # dedupe defensively: the prefix is the first p rows under the
    # rank window, so a duplicate (id, shingle) row would occupy two
    # rank slots and push a genuinely rare shingle OUT of the prefix
    # — a silent false negative from a function whose contract is
    # recall exactly 1.0 (same hazard jaccard_pairs documents)
    shingles = shingles.select(id_col, "shingle").distinct()
    df_counts = shingles.groupBy("shingle").agg(
        F.countDistinct(id_col).alias("__df")
    )
    sizes = shingles.groupBy(id_col).agg(
        F.countDistinct("shingle").alias("__sz")
    )
    w = Window.partitionBy(id_col).orderBy("__df", "shingle")
    ranked = (
        shingles.join(df_counts, "shingle")
        .withColumn("__r", F.row_number().over(w))
        .join(sizes, id_col)
    )
    prefix = ranked.where(
        F.col("__r")
        <= F.col("__sz") - F.ceil(F.col("__sz") * F.lit(threshold)) + 1
    ).select(id_col, "shingle", "__sz")
    a = prefix.select(
        F.col(id_col).alias("a"), "shingle", F.col("__sz").alias("__sz_a")
    )
    b = prefix.select(
        F.col(id_col).alias("b"), "shingle", F.col("__sz").alias("__sz_b")
    )
    return (
        a.join(
            b,
            on=[
                a.shingle == b.shingle,
                F.col("a") < F.col("b"),
                # length filter: |b| within [t*|a|, |a|/t]
                F.col("__sz_b")
                >= F.ceil(F.col("__sz_a") * F.lit(threshold)),
                F.col("__sz_b") * F.lit(threshold) <= F.col("__sz_a"),
            ],
        )
        .select("a", "b")
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash over word tokens (frequency-weighted): for each bit b
    of the token's md5 prefix, sum ±1 across tokens; positive sums set
    the bit. Bits are read from the md5 hex characters (4 bits per
    char) so the definition is engine-portable. Returns (id, simhash).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    n_chars = bits // 4
    # evaluate each hex digit once per row (instr is the expensive
    # part), then derive its 4 bits arithmetically
    h = toks.select(
        F.col(id_col),
        *[
            F.expr(
                f"instr('{HEX}', substring(md5(tok), {ci + 1}, 1)) - 1"
            ).alias(f"__d{ci}")
            for ci in range(n_chars)
        ],
    )
    aggs = []
    for b in range(bits):
        digit = F.col(f"__d{b // 4}")
        bit = F.floor(digit / F.lit(2 ** (b % 4))) % 2
        aggs.append(F.sum(bit * 2 - 1).alias(f"__s{b}"))
    sums = h.groupBy(id_col).agg(*aggs)
    value = None
    for b in range(bits):
        term = F.when(F.col(f"__s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        value = term if value is None else value + term
    return sums.select(F.col(id_col), value.cast("long").alias("simhash"))


def hamming_distance(a: Column, b: Column, bits: int = 32) -> Column:
    """Popcount of XOR — near-dup distance between simhashes."""
    x = a.bitwiseXOR(b)
    total = None
    for b_ in range(bits):
        t = F.shiftright(x, b_) % 2
        total = t if total is None else total + t
    return total


def simhash_neardup_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Banded Hamming near-dup join over simhash signatures — the
    scalable simhash dedup stage (Manku, Jain & Das Sarma, WWW'07):
    split the signature into ``bands`` contiguous bit bands; by
    pigeonhole any pair within Hamming distance ``bands - 1`` agrees
    exactly on at least one band, so candidates come from ``bands``
    equi-joins on the band value — never an all-pairs comparison —
    and the exact popcount confirm trims false candidates.

    Requires ``max_hamming <= bands - 1`` for completeness (asserted).
    Shuffle is keyed on (band, band value); bucket population is
    ~n / 2**band_width, so at larger corpora widen the signature and
    the bands together (e.g. 64-bit simhash with 16-bit bands keeps
    the within-bucket candidate blowup sub-quadratic at web scale),
    exactly like LSH band tuning in ``lsh_bands``.

    Returns distinct (id_a, id_b, hamming) with ``id_a < id_b``.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} not covered by {bands} bands; "
            "banding only guarantees recall up to bands - 1"
        )
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        F.col(id_col),
        F.col(hash_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col(hash_col), width * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__bk"),
    ).select(id_col, hash_col, "__bk.band", "__bk.key")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.key") == F.col("r.key"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{hash_col}").alias("__x"),
            F.col(f"r.{hash_col}").alias("__y"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            hamming_distance(F.col("__x"), F.col("__y"), bits).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over an undirected edge set by min-label
    propagation: every node's label converges to the minimum node id
    reachable from it. Returns ``(node, component)``.

    Near-dup graphs are unions of small dense clusters, so the
    diameter — and the iteration count — is tiny; each iteration is
    one shuffle on the node id (no quadratic closure is materialized,
    unlike the oracle's recursive CTE). Lineage is truncated per
    iteration so the loop doesn't accumulate a deep Catalyst plan.

    Truncation strategy: when a reliable checkpoint directory is
    configured (``spark.sparkContext.setCheckpointDir``), iterations
    use ``checkpoint()`` — blocks survive executor loss, which matters
    for a long-running clustered job. Otherwise ``localCheckpoint()``
    (executor-local blocks, lost with the executor) keeps the
    single-node/test path cheap.
    """
    sc = pairs.sparkSession.sparkContext
    reliable = sc._jsc.sc().getCheckpointDir().isDefined()

    def cut(d: DataFrame, eager: bool = True) -> DataFrame:
        if reliable:
            return d.checkpoint(eager=eager)
        return d.localCheckpoint(eager=eager)

    # pairs feeds both union branches; without the checkpoint Catalyst
    # recomputes its whole upstream lineage once per branch
    pairs = cut(pairs, eager=False)
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(
            pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        )
        .distinct()
    )
    edges = cut(edges, eager=False)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    def propagate(lbls: DataFrame) -> DataFrame:
        # candidate label for each node: the min label among neighbors
        nbr = (
            edges.join(lbls.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        return lbls.join(nbr, "node", "left").select(
            "node",
            F.least(
                "component", F.coalesce("nbr_min", "component")
            ).alias("component"),
            (
                F.coalesce("nbr_min", "component") < F.col("component")
            ).alias("__chg"),
        )

    for _ in range(max_iter):
        stepped = cut(propagate(labels))
        n_changed = stepped.where(F.col("__chg")).count()
        labels = stepped.drop("__chg")
        if n_changed == 0:
            break
    return labels


def dup_cluster_summary(
    pairs: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Cluster near-dup pairs into components and summarize each:
    ``(cluster_id, n_members)`` where ``cluster_id`` is the minimum
    doc id of the component — the canonical document a dedup pass
    would keep."""
    comp = connected_components(pairs, a, b)
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


def contamination_overlap(
    train_shingles: DataFrame,
    test_shingles: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/test contamination check — the decontamination primitive
    of a training-data pipeline: for every train document sharing at
    least one shingle with the held-out set, report how many of its
    shingles are contaminated and how many test documents it hits.

    Scale shape: the held-out set is small by construction, so its
    shingle table BROADCASTS and the train corpus is scanned ONCE — a
    left join against the broadcast test side feeds a single
    groupBy(id) computing shared count, test-doc count, and document
    size together (no second sizes scan, no shuffle on shingle).
    Returns (id, n_shared_shingles, n_test_docs, contamination) where
    contamination = shared / total shingles of the train doc.
    """
    test = test_shingles.select(
        F.col(id_col).alias("__test_id"), "shingle"
    )
    joined = train_shingles.join(F.broadcast(test), "shingle", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.countDistinct(
                F.when(F.col("__test_id").isNotNull(), F.col("shingle"))
            ).alias("n_shared_shingles"),
            F.countDistinct("__test_id").alias("n_test_docs"),
            F.countDistinct("shingle").alias("__sz"),
        )
        .where(F.col("n_shared_shingles") > 0)
        .withColumn(
            "contamination",
            F.round(F.col("n_shared_shingles") / F.col("__sz"), 6),
        )
        .drop("__sz")
    )


def lsh_star_pairs(
    buckets: DataFrame,
    id_col: str,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Star candidate pairs: within each (band, bucket) every member
    pairs with the bucket's MINIMUM id — B−1 pairs per bucket instead
    of the full join's B²/2. The production posting-cap move for
    skewed corpora (boilerplate mega-buckets): candidate mass is
    linear in bucket size, and the star keeps the downstream
    connected-components diameter ≤ 2 per bucket, so min-label
    propagation converges in a handful of iterations regardless of
    duplicate-group size (a B-member identical group costs B−1
    confirms, not B²/2).

    Recall contract: CLUSTER-level recall is preserved whenever
    buckets are similarity-pure (every member confirms against the
    bucket min, chaining the whole bucket into one component) — the
    planted-group and identical-boilerplate cases. PAIRWISE recall is
    deliberately traded: a pair both of whose endpoints confirm only
    against each other but not the bucket min can be missed — the
    standard trade every capped production pipeline makes
    (tests/test_hardening_r8.py proves removal-output equivalence
    with the full pairing on the real corpus at two SFs).

    ``max_bucket_size`` drops over-cap buckets entirely (same guard
    as ``lsh_candidate_pairs``).
    """
    if max_bucket_size is not None:
        sizes = buckets.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__sz")
        )
        buckets = (
            buckets.join(sizes, ["band", "bucket"])
            .where(F.col("__sz") <= max_bucket_size)
            .drop("__sz")
        )
    w = Window.partitionBy("band", "bucket")
    m = buckets.withColumn("__m", F.min(id_col).over(w))
    return (
        m.where(F.col(id_col) != F.col("__m"))
        .select(F.col("__m").alias("a"), F.col(id_col).alias("b"))
        .distinct()
    )
