"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the point of each algorithm at 100 TB):

- **exact**: one hash-aggregate on the content fingerprint — one shuffle of
  (hash, id), no text movement if the fingerprint is precomputed.
- **n-gram Jaccard**: exact pairwise similarity, but only *within candidate
  pairs*; generating all pairs is O(n²) and must never happen globally.
  The candidate generator here is the shingle inverted index (explode →
  self-join on shingle), which is the textbook shuffle-heavy exact method —
  bounded by frequent-shingle skew, so hot shingles are dropped via a
  document-frequency cap (stopword shingles pair everything with
  everything; capping df both fixes skew and removes noise pairs).
- **MinHash+LSH**: the scale path — k hash functions over shingles →
  signature; band the signature; join on (band_idx, band_hash). Shuffle is
  O(n·bands), independent of pair count. Hash = first 60 bits of
  md5(salt|shingle) so the signature is deterministic and reproducible by
  any engine (no RNG state).
- **SimHash**: 64-bit fingerprint whose Hamming distance tracks cosine
  similarity of the token multiset; near-dup candidates join on rotated
  prefix blocks. Cheapest per-row state (8 bytes).
- **embedding near-dup**: see operators/similarity.py — cosine threshold
  over LSH/IVF buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from land_registry_data_ingestion_spark.functions.text import (
    fingerprint,
    word_shingle_hashes,
    word_shingles,
)
from land_registry_data_ingestion_spark.util import barrier, spread

# --- exact ------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Group rows by normalized-content fingerprint: one row per distinct
    content with the canonical (min) id and the duplicate count.

    spread(): the md5-of-normalized-text map is CPU-bound; a small-file
    input (single split) would serialize it — no-op at real scale."""
    return (
        spread(df)
        .select(F.col(id_col), fingerprint(F.col(text_col)).alias("doc_fingerprint"))
        .groupBy("doc_fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per distinct normalized content."""
    w_min = exact_dedup_groups(df, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(w_min, id_col, "left_semi")


# --- shingle inverted index + exact Jaccard ---------------------------------


def _shingled(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    # spread: shingling + hashing is CPU-bound; don't let a single input
    # split serialize it (no-op when the scan already has ≥cores splits).
    return spread(df).select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.05,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All document pairs (a < b) with shingle-set Jaccard ≥ threshold.

    |A∩B| from the inverted-index self-join; |A∪B| = |A|+|B|-|A∩B|.
    ``max_shingle_df`` drops shingles appearing in more than that many docs
    (skew + noise control at scale).
    """
    # persist before exploding: the shingle arrays must cross a
    # materialization barrier or Generate re-evaluates the HOF expression
    # per output row (and the posting list is consumed by both join sides)
    sh = barrier(_shingled(df, id_col, text_col, k))
    posting = sh.select("doc", "n_shingles", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        rare = (
            posting.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        posting = posting.join(rare, "shingle", "left_semi")
    a = posting.select(
        F.col("shingle"),
        F.col("doc").alias("doc_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b = posting.select(
        F.col("shingle"),
        F.col("doc").alias("doc_b"),
        F.col("n_shingles").alias("n_b"),
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


# --- MinHash + LSH ----------------------------------------------------------


def _md5_hash64(col, salt: int):
    """Deterministic 60-bit integer hash: first 15 hex chars of
    md5(salt|value). Reproducible in any engine with md5 — no RNG."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col)), 1, 15), 16, 10
    ).cast("long")


# Universal hash family over the Mersenne prime 2^31-1: one expensive md5
# per shingle, then num_hashes cheap integer maps (a·h + b) mod P. All
# constants are deterministic (Knuth multiplicative sequence) so any engine
# reproduces the signature bit-for-bit.
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    return [
        (
            1 + (2_654_435_761 * (i + 1)) % (MINHASH_PRIME - 1),
            (40_503 * (i + 7)) % MINHASH_PRIME,
        )
        for i in range(num_hashes)
    ]


def minhash_signatures_from_shingles(
    sh: DataFrame,
    num_hashes: int = 16,
    carry: tuple[str, ...] = (),
    hashed: bool = False,
) -> DataFrame:
    """MinHash signatures from an already-shingled frame (``doc``,
    ``shingles``): min over the shingle set of each of ``num_hashes``
    universal-hash functions.

    Execution shape chosen for codegen, not elegance: the shingle's 60-bit
    md5 hash is computed ONCE per shingle (a naive per-salt md5 costs
    num_hashes× the CPU), hashes are EXPLODED to scalar rows, and each
    signature component is a plain ``min((a·h + b) % P)`` aggregate.
    Scalar expressions + hash-aggregate are whole-stage-codegen'd, and
    map-side partial aggregation collapses the exploded rows to one row
    per (doc, partition) before the shuffle — so the shuffle is
    O(docs × num_hashes) longs, never O(shingles). The prettier
    array-at-a-time form — ``array_min(transform(hs, ...))`` — runs ~10×
    slower because Spark interprets higher-order functions, and an
    Arrow/numpy kernel loses its win to nested-array serialization;
    measured at 100k docs: 12.8s (HOF) / 13.7s (Arrow) / ~2s (this).
    Same integers either way (a, h < 2³¹ keeps a·h+b inside int64).

    ``carry`` names doc-level columns (functionally dependent on ``doc``,
    e.g. ``n_shingles``) to ride through the aggregate as extra grouping
    keys — same groups, zero extra shuffled rows, and downstream
    consumers skip a join back to the shingled frame.

    ``hashed=True`` declares that ``shingles`` already holds the 60-bit
    ``_md5_hash64(s, 0)`` values (``array<long>``) instead of shingle
    strings — the round-11 mine-and-verify core materializes those so
    the verify join ships 8-byte elements; the signature then only pays
    the ``% P`` residue per element (same integers: the 60-bit hash is
    non-negative, so ``h % P`` equals ``md5_60(s) % P``).
    """
    per_shingle = (
        (lambda h: h % MINHASH_PRIME)
        if hashed
        else (lambda s: _md5_hash64(s, 0) % MINHASH_PRIME)
    )
    base = sh.filter(F.size("shingles") > 0).select(
        "doc",
        *carry,
        F.explode(F.transform(F.col("shingles"), per_shingle)).alias("h"),
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_coefficients(num_hashes))
    ]
    return base.groupBy("doc", *carry).agg(*aggs)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document.

    The shingled frame is persisted before the explode: without a
    materialization barrier Catalyst inlines the (expensive, HOF-built)
    shingle expression into the Generate and re-evaluates it per output
    row — measured 20× slower at 100k docs. Callers that already hold a
    materialized shingle frame should use
    :func:`minhash_signatures_from_shingles` directly."""
    return minhash_signatures_from_shingles(
        barrier(_shingled(df, id_col, text_col, k)), num_hashes
    )


def lsh_bands(
    signatures: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Banded signature rows ``(doc, band_idx, band_hash)`` — the LSH
    join key. Exposed separately so an INCREMENTAL consumer
    (``corpus_store.CorpusStore``) can persist the bands of accepted
    documents and probe new batches against them without re-signing the
    whole corpus. ``carry`` columns ride along unchanged (a few bytes per
    band row, in exchange for no join back to the signature frame)."""
    n_bands = num_hashes // band_size
    return signatures.select(
        "doc",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"mh_{b * band_size + j}")
                                    for j in range(band_size)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc", *carry, "band.band_idx", "band.band_hash")


def minhash_lsh_candidates(
    signatures: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    max_band_df: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair. Join key is (band_idx, band_hash) — shuffle volume is
    rows × bands, never rows².

    ``max_band_df`` bounds bucket fan-out: a bucket of m docs emits
    C(m,2) candidate pairs, so ONE degenerate band value (boilerplate- or
    template-dominated corpora — docs whose sampled shingles coincide
    without the docs being near-duplicates) can go quadratic even though
    total bucket count stays linear. Buckets holding more than
    ``max_band_df`` docs are dropped before the self-join — the analogue
    of ``ngram_jaccard_pairs``' ``max_shingle_df`` one level up. Recall
    note: a TRUE near-dup family of m > max_band_df identical-signature
    docs normally still pairs via the exact-content collapse in
    :func:`minhash_near_duplicates` (identical docs never reach the
    banded join at all); the cap only risks pairs whose sole common band
    is a hot one, which at sensible caps (≥ 64) are overwhelmingly
    coincidence pairs the verify step would reject anyway. Default off —
    declared-query semantics (and their oracles) are exact."""
    # Same double-evaluation guard as the mine-and-verify core (round
    # 12): the self-join's two selects (and the optional cap) would each
    # re-run the signature producer — barrier the skinny band rows once.
    bands = barrier(lsh_bands(signatures, num_hashes, band_size))
    if max_band_df is not None:
        # ids-only aggregate + semi join on the same key the candidate
        # join shuffles on — no extra data movement of consequence.
        ok = (
            bands.groupBy("band_idx", "band_hash")
            .agg(F.count("*").alias("band_df"))
            .filter(F.col("band_df") <= max_band_df)
            .select("band_idx", "band_hash")
        )
        bands = bands.join(ok, ["band_idx", "band_hash"], "left_semi")
    a = bands.select("band_idx", "band_hash", F.col("doc").alias("doc_a"))
    b = bands.select("band_idx", "band_hash", F.col("doc").alias("doc_b"))
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _minhash_members_and_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    band_size: int,
    threshold: float,
    max_band_df: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared mine-and-verify core of the MinHash near-dup family.

    Returns ``(members, verified)``:

    - ``members`` — barriered ``(doc, cfp, n_shingles)``, one row per
      input document, where ``cfp`` is a 16-byte (two-lane xxhash64)
      content fingerprint of the document's distinct-shingle array
      (identical shingle arrays ⇔ identical cfp, modulo 128-bit
      collisions — vanishing even at 10^10 documents);
    - ``verified`` — ``(doc_a, doc_b, jaccard)``: verified (exact
      Jaccard ≥ threshold) pairs between family REPRESENTATIVE doc ids
      (each family's min doc id), one row per family pair regardless of
      family sizes, ``doc_a < doc_b``.

    Consumers expand these differently: :func:`minhash_near_duplicates`
    into member-level pairs (all-pairs or star, via the ``cfp``-keyed
    :func:`_minhash_members_and_rep_pairs` wrapper), and
    :func:`minhash_near_dup_groups` into canonical groups via connected
    components over the (tiny) rep graph — whose node ids ARE these rep
    doc ids.
    """
    # Deliberately NOT a shared barrier on the fat shingled frame: caching
    # the 140-string arrays for 100k docs costs more (block-store
    # materialization + memory pressure) than recomputing the shingle map
    # — measured 4.2 s total with the map run twice vs 13-25 s with the
    # shared cache. Only the skinny frames (id projection, collapsed
    # reps) are barriered, and the second shingle pass runs over the
    # REPRESENTATIVES ONLY (collapse-factor× less text than the round-2
    # shape, which re-shingled every member into the groupBy and shuffled
    # all members' shingle arrays; here only rep ids cross the join and
    # only rep arrays are ever built).
    #
    # The member pass never builds shingle STRINGS at all: grouping by
    # identical shingle arrays only needs an injective-enough array key,
    # and ``word_shingle_hashes`` is positionally aligned with
    # ``word_shingles`` (gram i's hash ↔ gram i's string; array_distinct
    # keeps first-occurrence order on both), so xxhash64 over the hash
    # array groups exactly like a digest of the string array. This
    # replaces the round-5 shape (string shingles + md5 of the \x01-join
    # — k-1 concats plus an md5 of the whole document's shingle text per
    # row): two xxhash64 combines per row and a 16-byte group key, which
    # also makes every downstream cfp join/groupBy a 2-long struct, not
    # a 32-char string. Measured at the bench scale tier (100k docs), isolated
    # member-barrier materialization, same session: min-of-2 1.34 s →
    # 0.54 s (first runs 3.98 s → 1.31 s).
    # The doc-level cfp is 128-BIT (two chained-seed xxhash64 views of
    # the same gram-hash array — the lit(1) prefix reseeds the second
    # lane, so the lanes are independent): a cfp collision silently
    # merges two DISTINCT documents into one "identical-content" family
    # and fabricates jaccard=1.0 pairs, so the doc-level key must stay
    # collision-free at corpus scale. At 64 bits the birthday bound is
    # n²/2^65 — marginal at the 10^10-document scale this operator
    # targets; at 128 bits it is vanishing. Per-GRAM hashes stay 64-bit
    # (a gram collision only perturbs one Jaccard estimate, the class
    # the gram-hash contract already accepts). The struct is a pure
    # equi-key (groupBy/join only), so consumers are unchanged.
    shingled_ids = spread(df).select(
        F.col(id_col).alias("doc"),
        word_shingle_hashes(F.col(text_col), k).alias("_sh"),
    ).select(
        "doc",
        F.struct(
            F.xxhash64("_sh").alias("h0"),
            F.xxhash64(F.lit(1), F.col("_sh")).alias("h1"),
        ).alias("cfp"),
        F.size("_sh").alias("n_shingles"),
    )
    members = barrier(shingled_ids)
    rep_ids = members.groupBy("cfp").agg(F.min("doc").alias("doc")).select("doc")
    reps = df.join(
        rep_ids.withColumnRenamed("doc", id_col), id_col, "left_semi"
    )
    # Round-11 shape (guide §2.4/§8: skinny keys decide, fat rows move
    # once, late). Three structural changes vs the round-10 plan, all
    # value-identical:
    #
    # 1. ``sh`` no longer joins the fat shingle arrays with ``members``
    #    to pick up ``cfp`` — that was a SortMergeJoin whose exchanges
    #    shuffled every representative's string arrays before the
    #    pipeline proper even started. ``cfp`` is functionally dependent
    #    on ``doc``, so it is attached AT THE END, to the (tiny)
    #    verified pair set, by two joins against the skinny ``members``
    #    projection.
    # 2. ``n_shingles`` rides through the signature aggregate and the
    #    band rows (``carry`` — extra grouping key, zero extra rows), so
    #    the AllPairs/PPJoin length prune (J(A,B) ≥ t ⟹ t·|B| ≤ |A|;
    #    provably no qualifying pair dropped) applies IN the band
    #    self-join output — before the pair ``distinct`` — instead of
    #    via two joins back to the shingled frame. 8 bytes per band row
    #    buys the removal of two SortMergeJoins and their exchanges.
    # 3. The candidate join is inlined (``minhash_lsh_candidates`` stays
    #    as the public single-purpose operator; its declared semantics —
    #    filter-before-distinct commutes with distinct-then-filter on a
    #    pair-deterministic predicate — are preserved bit-for-bit).
    # 4. (round 11, guide §2.3 "shuffle keys and metadata instead of
    #    payloads") ``sh`` materializes the 60-bit ``_md5_hash64`` of
    #    each distinct shingle (``array<long>``, ~8 B/element) instead
    #    of the shingle STRINGS (~k·word bytes): the signature pass was
    #    already reducing each string to exactly this hash before its
    #    ``% P`` residues, so minima are unchanged integer-for-integer,
    #    and the Jaccard verify — an equality-only set intersection —
    #    rides the same equality-modulo-collisions contract as ``cfp``
    #    one level up (within-pair perturbation ~|A|·|B|/2^60). The
    #    barrier, both verify-side joins, and the ``array_intersect``
    #    all move/compare longs instead of strings.
    sh = barrier(
        spread(reps)
        .select(
            F.col(id_col).alias("doc"),
            F.transform(
                word_shingles(F.col(text_col), k),
                lambda s: _md5_hash64(s, 0),
            ).alias("shingles"),
        )
        .withColumn("n_shingles", F.size("shingles"))
    )
    # Round 12: bands are consumed by BOTH sides of the self-join below
    # (plus the optional band-df cap) — left lazy, the signature
    # aggregate (explode of every shingle hash + num_hashes min-aggs,
    # the family's most expensive reduction) and the band md5 expansion
    # execute once PER CONSUMER. Barriered, they run once: ~4 skinny
    # rows per rep (idx, 32-char hash, doc, n_shingles).
    bands = barrier(
        lsh_bands(
            minhash_signatures_from_shingles(
                sh, num_hashes, carry=("n_shingles",), hashed=True
            ),
            num_hashes,
            band_size,
            carry=("n_shingles",),
        )
    )
    if max_band_df is not None:
        ok = (
            bands.groupBy("band_idx", "band_hash")
            .agg(F.count("*").alias("band_df"))
            .filter(F.col("band_df") <= max_band_df)
            .select("band_idx", "band_hash")
        )
        bands = bands.join(ok, ["band_idx", "band_hash"], "left_semi")
    a_band = bands.select(
        "band_idx",
        "band_hash",
        F.col("doc").alias("doc_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b_band = bands.select(
        "band_idx",
        "band_hash",
        F.col("doc").alias("doc_b"),
        F.col("n_shingles").alias("n_b"),
    )
    sized = (
        a_band.join(b_band, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            (F.col("n_a") >= threshold * F.col("n_b"))
            & (F.col("n_b") >= threshold * F.col("n_a"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    joined = sized.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    verified = (
        joined.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return members, verified


def _minhash_members_and_rep_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    band_size: int,
    threshold: float,
    max_band_df: int | None,
) -> tuple[DataFrame, DataFrame]:
    """``(members, rep_pairs)`` with rep pairs keyed by ``cfp`` — the
    family-key form the member-pair EXPANSION consumes (members join on
    ``cfp`` directly). ``cfp`` is functionally dependent on the rep's
    ``doc``, so it is attached to the (tiny) verified pair set by two
    joins against the skinny ``members`` projection — consumers that can
    use rep DOC ids directly (the groups path: rep ids ARE the
    propagation node ids) should take
    :func:`_minhash_members_and_verified_pairs` and skip the attach."""
    members, verified = _minhash_members_and_verified_pairs(
        df, id_col, text_col, k, num_hashes, band_size, threshold, max_band_df
    )
    cfp_a = members.select(
        F.col("doc").alias("doc_a"), F.col("cfp").alias("cfp_a")
    )
    cfp_b = members.select(
        F.col("doc").alias("doc_b"), F.col("cfp").alias("cfp_b")
    )
    rep_pairs = (
        verified.join(cfp_a, "doc_a")
        .join(cfp_b, "doc_b")
        .select("cfp_a", "cfp_b", "jaccard")
    )
    return members, rep_pairs


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    max_band_df: int | None = None,
    family_edges: str = "all-pairs",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates verified with exact Jaccard
    (verify step touches only candidate pairs).

    ``family_edges``: ``"all-pairs"`` (default) emits every member-level
    pair — the declared PAIRS semantics. ``"star"`` emits a
    connectivity-equivalent linear-size edge set (family-min ↔ member
    stars + one rep-level edge per verified family pair) for consumers
    that only need connected components (``near_dup_groups``).

    **Identical-content collapse** (the dedup-cascade): real corpora are
    full of exact duplicates, and every m-way duplicate family would
    otherwise inject C(m,2) candidate pairs into the verify join — at a
    20-way replication that is 190 shingle-array comparisons per family
    computing the same answer. Since signatures, LSH candidacy, the size
    filter, and Jaccard are all pure functions of the shingle array, docs
    with identical arrays are collapsed to one representative BEFORE the
    pipeline and pair results are expanded afterwards:

    - intra-family pairs are emitted directly with jaccard = 1.0 (what
      verify would compute: inter = union);
    - representative pairs expand to the family cross product, same
      jaccard (the arrays are identical).

    Provably the same output as running the pipeline over all docs;
    measured 106 s → ~13 s on the 100k-doc / 20-way-family scale probe.

    The shingled frame is consumed multiple times (grouping, signatures,
    verify sides), so it is persisted rather than recomputed per branch —
    at cluster scale this intermediate would be staged to Parquet between
    pipeline steps; MEMORY_AND_DISK gives the same compute-once semantics
    here without a write barrier. The mine-and-verify core lives in
    :func:`_minhash_members_and_rep_pairs`; this function is the pair
    EXPANSION on top of it.
    """
    members, rep_pairs = _minhash_members_and_rep_pairs(
        df, id_col, text_col, k, num_hashes, band_size, threshold, max_band_df
    )

    if family_edges == "star":
        # CONNECTIVITY-ONLY output for consumers that group, not rank:
        # an m-way identical family contributes m-1 star edges
        # (family-min ↔ member) instead of C(m,2), and an inter-family
        # rep pair stays ONE edge (rep ↔ rep) instead of m_a·m_b.
        # Connected components are provably identical — every member
        # reaches its rep through the star, and reps carry the verified
        # inter-family links — but the edge count is linear in corpus
        # size where the cross product is quadratic in family size (the
        # 400k-doc scaling tier measured exponent 2.38 on the expanded
        # form: 80-way families → 16× the edges of the 20-way tier).
        rep_doc = members.filter(F.col("n_shingles") > 0).groupBy(
            "cfp"
        ).agg(F.min("doc").alias("rep"))
        ra = rep_doc.select(F.col("cfp").alias("cfp_a"), F.col("rep").alias("da"))
        rb = rep_doc.select(F.col("cfp").alias("cfp_b"), F.col("rep").alias("db"))
        cross = (
            rep_pairs.join(ra, "cfp_a")
            .join(rb, "cfp_b")
            .select(
                F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"),
                "jaccard",
            )
        )
        intra = (
            members.filter(F.col("n_shingles") > 0)
            .join(rep_doc, "cfp")
            .filter(F.col("doc") != F.col("rep"))
            .select(
                F.col("rep").alias("doc_a"),
                F.col("doc").alias("doc_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        if threshold > 1.0:
            return cross
        return cross.unionByName(intra)

    # Expand representative pairs to member pairs (families differ, so
    # member ids interleave → re-order with least/greatest).
    ma = members.select(F.col("cfp").alias("cfp_a"), F.col("doc").alias("da"))
    mb = members.select(F.col("cfp").alias("cfp_b"), F.col("doc").alias("db"))
    cross = (
        rep_pairs.join(ma, "cfp_a")
        .join(mb, "cfp_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "jaccard",
        )
    )
    # Intra-family pairs: identical arrays ⇒ identical signatures ⇒ all
    # bands collide ⇒ candidate; Jaccard = 1.0 exactly. Empty-shingle
    # docs carry no signature (size > 0 filter) and so never pair —
    # mirror that by excluding n_shingles = 0 families.
    m1 = members.filter(F.col("n_shingles") > 0).select(
        "cfp", F.col("doc").alias("doc_a")
    )
    m2 = members.filter(F.col("n_shingles") > 0).select(
        "cfp", F.col("doc").alias("doc_b")
    )
    intra = (
        m1.join(m2, "cfp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(1.0).alias("jaccard"))
    )
    if threshold > 1.0:  # degenerate config: J = 1.0 wouldn't qualify
        return cross
    return cross.unionByName(intra)


# --- near-dup grouping (connected components) -------------------------------


def near_dup_groups(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Turn near-dup PAIRS into canonical GROUPS: connected components by
    iterative min-label propagation, the keep-one semantics a training-
    data pipeline actually applies (drop every doc whose ``doc !=
    canonical_doc``).

    Each iteration is one distributed join + aggregate (label ← min of
    own and neighbors' labels) PLUS a pointer jump (label ← label's
    label, the path-halving step of pointer-jumping CC algorithms à la
    Kiveris et al.); the driver only checks a convergence COUNT per
    iteration, never collects data. The jump makes convergence
    O(log diameter) instead of O(diameter): shallow dup families finish
    in 2-3 rounds either way, but band-df capping can sparsify large
    replicated families into LONG chains — the 400k-doc scaling tier
    produced components that neighbor-min alone could not resolve in 25
    rounds, while path halving collapses any realistic chain well
    inside the budget (25 rounds ≈ diameter 2²⁵).

    Returns (doc, canonical_doc, n_members) for every doc that appears
    in ≥1 pair; canonical_doc = min doc id of the component, so output
    is deterministic and oracle-checkable.

    Plan shape (round 5 — one data exchange per round, down from ~5):
    edges are cached hash-partitioned on ``dst`` and labels carry
    hash(id) partitioning out of each round's cached join output, so
    the probe join (dst == id) and the label update join (id == src,
    against the hash(src)-partitioned aggregate) both align with ZERO
    new exchange — only the propagation aggregate (groupBy src) moves
    data, which is the step that IS the propagation. Shuffle-hash hints
    keep the per-round joins sort-free, the convergence count reads the
    round's own cached output (old and new label ride the same barrier
    — no separate compare join), and component sizes come from one
    window over the final labels instead of a groupBy + self-join.
    """
    import time as _time

    # Barrier the INPUT pairs before the fwd/rev mirror: both selects
    # reference ``pairs``, so an unbarriered (typically expensive — the
    # whole MinHash mine-and-verify pipeline) producer would execute
    # twice when ``edges`` materializes. Inner barriers of the producer
    # dedup its scans but not its join/verify stages; this one-row-per-
    # pair materialization is strictly smaller than either re-run
    # (measured at the bench scale tier: CC round 1 drops ~7 s → ~4 s).
    pairs = barrier(pairs.select(id_a, id_b))
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = barrier(fwd.union(rev).distinct().repartition("dst"))
    if stats is not None:
        # instrumentation for the scaling/round-cut probes: per-round
        # wall seconds + changed-label counts (the loop is lazy until
        # each round's localCheckpoint, so timing the loop body times
        # the round's actual work)
        stats["rounds"] = []
    # ROUND 1 specialization (round 11): against the identity labeling
    # the general round body degenerates — label(dst) = dst, so the
    # probe join contributes min(dst) directly, and label(label(id)) =
    # id makes the pointer jump a no-op — so the whole first round is
    # ONE aggregate, least(src, min(dst)) per src, with zero joins. It
    # also subsumes the identity-labels barrier (distinct over edges +
    # a materialization) the loop previously seeded itself with: three
    # shuffle-hash joins, one distinct and one persist on the biggest
    # round (every label changes in round 1) replaced by one exchange.
    # The aggregate output is hash(src)-partitioned = hash(id), the
    # same alignment property every later round's cached output has.
    _round_t0 = _time.perf_counter()
    joined = barrier(
        edges.groupBy("src")
        .agg(F.min("dst").alias("_nbr"))
        .select(
            F.col("src").alias("id"),
            F.col("src").alias("_old"),
            F.least(F.col("src"), F.col("_nbr")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    n_changed = joined.filter(F.col("label") != F.col("_old")).count()
    if stats is not None:
        stats["rounds"].append(
            {
                "sec": round(_time.perf_counter() - _round_t0, 3),
                "n_changed": n_changed,
            }
        )
    prev_cache = joined
    labels = joined.select("id", "label")
    for _ in range(max_iters - 1):
        if n_changed == 0:
            break
        _round_t0 = _time.perf_counter()
        nbr = (
            edges.join(labels.hint("shuffle_hash"), edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Pointer jumping: alongside the neighbor min, each node also
        # adopts its LABEL'S label (label(v) is a node in v's component,
        # so label(label(v)) is too — the update stays within the
        # component and is monotone decreasing). Neighbor-min alone
        # converges in O(diameter) rounds, and diameter is adversarial
        # in practice: the tier-2 scaling probe (400k docs, band-df cap
        # sparsifying 80-way dup families into chains) blew past 25
        # rounds. With the jump, chains halve every round —
        # O(log diameter) — so 25 rounds covers any component a real
        # corpus can produce. One extra shuffle-hash join per round on
        # the (id, label) table; the round count it buys back dominates.
        jump = (
            labels.select(
                F.col("id").alias("jid"), F.col("label").alias("jsrc")
            )
            .join(
                labels.hint("shuffle_hash").select(
                    F.col("id").alias("lid"), F.col("label").alias("jlabel")
                ),
                F.col("jsrc") == F.col("lid"),
            )
            .select("jid", "jlabel")
        )
        # localCheckpoint, not barrier: each round's plan references
        # ``labels`` THREE times (probe join, jump join, update join),
        # so an un-truncated lineage grows exponentially — plans that
        # OOM the driver's analyzer near round ~12 (caught by the
        # 12-node-path test; a persist materializes data but Catalyst
        # still re-analyzes the full tree). localCheckpoint cuts the
        # plan to a LogicalRDD each round, keeps the physical
        # partitioning (so the co-partitioning alignment below still
        # holds), and is eager — materialization doubles as this
        # round's barrier. On a cluster with a reliable checkpoint dir,
        # ``checkpoint()`` gives the same truncation with fault
        # tolerance.
        #
        # The persist LAYERED ON TOP is a second, distinct truncation —
        # of the SIZE ESTIMATE, not the plan. Dataset.checkpoint copies
        # the pre-checkpoint plan's Statistics into the LogicalRDD
        # (originStats), and join estimation MULTIPLIES sizeInBytes; a
        # loop of self-referencing joins therefore roughly CUBES the
        # estimate every round. The numbers stop meaning anything
        # almost immediately, and by convergence on the 400k-doc tier
        # the estimate was a ~20k-DIGIT BigInteger whose Karatsuba/
        # Toom-Cook multiplications made Catalyst's stats visitor the
        # bottleneck: 122 s of single-threaded DRIVER time in one round
        # against 8 s of executor time (jstack: BigInteger.multiply).
        # A materialized InMemoryRelation instead reports the ACTUAL
        # cached size, so planning each round on the persisted frame
        # re-seeds the estimate at ~11 bits and the per-round stats
        # cost is flat. The count() below is what materializes it;
        # barrier() supplies the tracked DISK_ONLY persist (the final
        # round's cache is then released with the query's other
        # barriers — in-loop rounds release below, idempotently).
        joined = barrier(
            labels.join(
                nbr.hint("shuffle_hash"), labels["id"] == nbr["src"], "left"
            )
            .join(jump, labels["id"] == F.col("jid"), "left")
            .select(
                labels["id"].alias("id"),
                labels["label"].alias("_old"),
                F.least(
                    labels["label"],
                    F.coalesce(F.col("nbr_label"), labels["label"]),
                    F.coalesce(F.col("jlabel"), labels["label"]),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = joined.filter(F.col("label") != F.col("_old")).count()
        if stats is not None:
            stats["rounds"].append(
                {
                    "sec": round(_time.perf_counter() - _round_t0, 3),
                    "n_changed": n_changed,
                }
            )
        # the previous round's cache is dead weight from here (same
        # discipline as the BPE merge loop — per-round caches must not
        # accumulate)
        prev_cache.unpersist(blocking=False)
        prev_cache = joined
        labels = joined.select("id", "label")
        if n_changed == 0:
            break
    if n_changed != 0:
        # explicit check, not for/else: round 1 runs before the loop, so
        # a for/else would mis-raise on a converged round 1 when
        # max_iters == 1 (zero loop iterations still run the else)
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds"
        )
    wl = Window.partitionBy("label")
    return labels.select(
        F.col("id").alias("doc"),
        F.col("label").alias("canonical_doc"),
        F.count("*").over(wl).alias("n_members"),
    )


def minhash_near_dup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    max_band_df: int | None = None,
    max_iters: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """MinHash near-dup GROUPS end-to-end: connected components computed
    on the REP GRAPH (one node per identical-content family), then
    propagated to members with one join.

    Equivalent to ``near_dup_groups(minhash_near_duplicates(...,
    family_edges="star"))`` — same (doc, canonical_doc, n_members) rows —
    but the iterative propagation runs over |families| nodes and
    |verified family pairs| edges instead of |docs| nodes and |docs|
    star edges. Correctness of the collapse: every member reaches its
    family rep (rep = min doc of the family, so the component minimum
    over reps IS the component minimum over docs), reps carry all
    verified inter-family links, and a family is in the output iff it
    can emit at least one pair (m ≥ 2 members — intra pairs at
    jaccard 1.0, impossible when threshold > 1.0 — or ≥ 1 verified
    cross pair).

    This is the 100 TB shape for grouping: exact-content collapse
    typically shrinks a crawl corpus 2-10×, so every propagation round's
    joins, checkpoints, and convergence counts run on the collapsed
    table while the full corpus is touched exactly twice — once to
    fingerprint members, once to join the final labels back.
    """
    members, verified = _minhash_members_and_verified_pairs(
        df, id_col, text_col, k, num_hashes, band_size, threshold, max_band_df
    )
    fam = barrier(
        members.filter(F.col("n_shingles") > 0)
        .groupBy("cfp")
        .agg(F.min("doc").alias("rep"), F.count("*").alias("m"))
    )
    # The verified pairs already carry the propagation node ids: a
    # family's rep is its min doc id, every family member shares one
    # shingle array (identical cfp ⇔ identical array ⇒ identical
    # n_shingles, so the n > 0 filter keeps whole families), hence
    # ``fam.rep`` for any family reaching the verify step equals the
    # rep doc id the pair rows hold. The round-10 shape re-derived that
    # identity through two joins (pairs → cfp → fam → rep); round 11
    # feeds the doc-level pairs to label propagation directly.
    rep_edges = verified.select("doc_a", "doc_b")
    roots = near_dup_groups(
        rep_edges, max_iters=max_iters, stats=stats
    ).select(F.col("doc").alias("rep"), F.col("canonical_doc").alias("_root"))
    rep_label = fam.join(roots, "rep", "left").filter(
        (F.col("_root").isNotNull())
        | ((F.col("m") >= 2) & F.lit(threshold <= 1.0))
    )
    out = (
        members.filter(F.col("n_shingles") > 0)
        .join(rep_label.select("cfp", "rep", "_root"), "cfp")
        .select(
            "doc", F.coalesce("_root", F.col("rep")).alias("canonical_doc")
        )
    )
    wl = Window.partitionBy("canonical_doc")
    return out.select(
        "doc", "canonical_doc", F.count("*").over(wl).alias("n_members")
    )


# --- SimHash ----------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 60,
    use_arrow: bool = True,
) -> DataFrame:
    """SimHash over the distinct token set: bit b of the fingerprint is the
    majority vote of bit b across token hashes.

    Token hash = the same md5-derived 60-bit integer as MinHash, so the
    fingerprint is engine-reproducible (an xxhash64 variant would be faster
    but oracle-opaque). Both forms are pure maps with ZERO shuffle —
    nothing to spill or skew at 100 TB.

    Default form: one Arrow ``mapInPandas`` kernel per batch — tokenize,
    hashlib-md5 per distinct token, one numpy bit-matrix popcount.
    Measured 1.16 s vs 3.20 s for the JVM 60-fold expression form at the
    100k-doc probe, fingerprints bit-identical (the earlier A/B that kept
    the folds only compared JVM variants: folds 3.0 s beat explode+sum
    5.2 s and packed-long 4.5 s; the Python kernel beats them all because
    2.3M hashlib calls parallelize across workers while each JVM md5 goes
    through the interpreted HOF transform).

    ``use_arrow=False`` keeps the pure-expression form: tokens → hash
    array → per-bit popcounts via 60 ``F.aggregate`` folds. It remains
    the choice when Python workers are unavailable (JVM-only clusters).
    """
    assert bits <= 60, "md5-derived hash provides 60 bits"
    if use_arrow:
        return _simhash_arrow(df, id_col, text_col, bits)
    hashed = spread(df).select(
        F.col(id_col).alias("doc"),
        F.transform(
            F.array_distinct(
                F.split(
                    F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")),
                    " ",
                )
            ),
            lambda t: _md5_hash64(t, 0),
        ).alias("hs"),
    ).withColumn("n_tok", F.size("hs"))
    ones = lambda b: F.aggregate(  # noqa: E731
        "hs",
        F.lit(0).cast("long"),
        lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)),
    )
    fp = None
    for b in range(bits):
        bit = (ones(b) * 2 > F.col("n_tok")).cast("long") * F.lit(1 << b)
        fp = bit if fp is None else fp + bit
    return hashed.select(F.col("doc").alias(id_col), fp.alias(f"simhash{bits}"))


def _simhash_arrow(
    df: DataFrame, id_col: str, text_col: str, bits: int
) -> DataFrame:
    """Arrow kernel behind :func:`simhash`: same normalization (lower,
    collapse whitespace, trim, split), same ``md5('0|' + token)`` 60-bit
    hashes, popcounts as one (n_tokens × bits) numpy bit matrix. Parity
    with the expression form is asserted per-call-site by the oracle suite
    and was verified bit-identical over the 100k-doc probe."""
    import hashlib
    import re
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    # ASCII whitespace ONLY, and the token split must reproduce the
    # expression form exactly: Java regex \s (no UNICODE_CHARACTER_CLASS)
    # is [ \t\n\x0B\f\r], Spark's trim strips ASCII spaces, and
    # split-on-" " of an empty string yields one empty token. Python's
    # bare str.split()/strip() are UNICODE-whitespace (\xa0,  , …)
    # and drop the empty token — a crawl document containing an NBSP
    # would fingerprint differently in the two forms. CASE: Python
    # str.lower() and Java toLowerCase both implement Unicode default
    # case conversion (final sigma included — verified agreement in
    # tests/test_repetition.py); the residual divergence class is a
    # Turkish/Azeri/Lithuanian JVM DEFAULT LOCALE, where Java's
    # locale-sensitive mapping lowers 'I' to dotless 'ı' while
    # Python's locale-free mapping does not.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    shifts = np.arange(bits, dtype=np.int64)
    # nullable: NULL text must yield a NULL fingerprint, matching the
    # expression form (where every step of the popcount folds NULL
    # through) — the kernel previously crashed the worker on the first
    # NULL document.
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField(f"simhash{bits}", T.LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-task token-hash memo: md5('0|'+token) is a pure function of
        # the token, and real corpora follow Zipf — most token
        # occurrences are repeats (duplicate-heavy corpora extremely so).
        # Capped so an adversarial unbounded vocabulary cannot grow the
        # worker heap; at the cap the kernel degrades to the uncached
        # cost, never above it. Measured at the bench scale tier (100k
        # docs): 2.32M uncached md5 calls; memoized calls ≈ per-task
        # distinct vocabulary (the synthetic tier's 31-token vocabulary
        # × ~32 tasks ≈ 1k — real corpora land in between, bounded by
        # the cap).
        memo: dict[str, int] = {}
        memo_cap = 1_000_000

        def h(t: str) -> int:
            v = memo.get(t)
            if v is None:
                v = int(hashlib.md5(("0|" + t).encode()).hexdigest()[:15], 16)
                if len(memo) < memo_cap:
                    memo[t] = v
            return v

        for pdf in batches:
            fps: list[int | None] = [None] * len(pdf)
            for i, text in enumerate(pdf[text_col]):
                if text is None:
                    continue  # NULL text → NULL fingerprint (expr parity)
                toks = dict.fromkeys(
                    ws.sub(" ", text.lower()).strip(" ").split(" ")
                )
                hs = np.fromiter(
                    (h(t) for t in toks), dtype=np.int64, count=len(toks)
                )
                ones = ((hs[:, None] >> shifts) & 1).sum(axis=0)
                fps[i] = int((((ones * 2 > len(hs)).astype(np.int64)) << shifts).sum())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    f"simhash{bits}": pd.array(fps, dtype="Int64"),
                }
            )

    return spread(df.select(id_col, text_col)).mapInPandas(kernel, out_schema)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 60,
    n_blocks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the fingerprint into ``n_blocks`` blocks;
    any pair within Hamming ``n_blocks - 1`` matches exactly on ≥1 block,
    so candidates come from an equi-join on (block_idx, block_value) —
    shuffle O(n·blocks) — and only candidates pay the popcount verify.
    Requires ``max_hamming < n_blocks`` for zero false negatives.
    """
    assert max_hamming < n_blocks, "pigeonhole guarantee needs hamming < blocks"
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    fp_col = f"simhash{bits}"
    # Identical-fingerprint collapse (same cascade as MinHash): candidacy
    # and Hamming distance are pure functions of the fingerprint, so the
    # block join runs over DISTINCT fingerprints; same-fp docs pair up
    # directly at hamming 0 and cross-fp rep pairs expand to members.
    # Output provably identical; the verify join shrinks from O(docs ×
    # blocks) to O(distinct fps × blocks) rows.
    all_fps = barrier(
        simhash(df, id_col, text_col, bits).select(
            F.col(id_col).alias("doc"), F.col(fp_col).alias("fp")
        )
    )
    # Round 12: both sides of the block self-join (a/b below) derive
    # from ``blocks`` — left lazy, the distinct-fp aggregate and the
    # block expansion execute once per side. Barriered (≤ n_blocks
    # skinny rows per DISTINCT fingerprint), they run once — the same
    # double-evaluation guard as the MinHash band barrier.
    fps = all_fps.groupBy("fp").agg(F.min("doc").alias("doc"))
    blocks = barrier(fps.select(
        F.col("doc"),
        F.col("fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftright("fp", b * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select("doc", "fp", "blk.block_idx", "blk.block_val"))
    a = blocks.select(
        "block_idx", "block_val", F.col("doc").alias("doc_a"), F.col("fp").alias("fp_a")
    )
    b = blocks.select(
        "block_idx", "block_val", F.col("doc").alias("doc_b"), F.col("fp").alias("fp_b")
    )
    # Hamming verify BEFORE the pair distinct (round 11): the distance is
    # a pure in-row function of (fp_a, fp_b), so filtering first drops
    # the (overwhelmingly failing — random-fp block collisions) candidate
    # pairs before the distinct's exchange instead of after it; the
    # distinct then dedups true pairs only. Same rows out — filter and
    # distinct commute on a pair-deterministic predicate.
    rep_pairs = (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("fp_a", "fp_b", "hamming")
        .distinct()
    )
    # Expand rep pairs to member pairs; ids interleave across fp groups.
    ma = all_fps.select(F.col("fp").alias("fp_a"), F.col("doc").alias("da"))
    mb = all_fps.select(F.col("fp").alias("fp_b"), F.col("doc").alias("db"))
    cross = (
        rep_pairs.join(ma, "fp_a")
        .join(mb, "fp_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "hamming",
        )
    )
    # Same-fingerprint docs: every pair is hamming 0 (always ≤ max_hamming).
    s1 = all_fps.select("fp", F.col("doc").alias("doc_a"))
    s2 = all_fps.select("fp", F.col("doc").alias("doc_b"))
    intra = (
        s1.join(s2, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("long").alias("hamming"))
    )
    return cross.unionByName(intra)
