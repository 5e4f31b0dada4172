"""Similarity-search queries over ``embeddings``: exact brute-force
cosine top-k, IVF-style cell-restricted top-k, near-dup pairs, and
the vectorized (numpy GEMM) throughput path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as SIM
from ..registry import query, table

_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1,65),"
    " i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (x,y) -> x+y)"
)
_BASE_CTE = (
    "base AS (SELECT vec_id, label, embedding, sqrt("
    + _DOT.format(a="embedding", b="embedding")
    + ") AS nrm FROM embeddings)"
)


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH {_BASE_CTE},
    q AS (SELECT * FROM base WHERE vec_id % 50 = 0),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN base c ON q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p) t
    WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for every 50th vector — the correctness
    baseline (left-fold double arithmetic, bit-reproducible)."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(emb, k=5, query_pred=F.col("vec_id") % 50 == 0)


@query(
    "ann_ivf_label",
    oracle=f"""
    WITH {_BASE_CTE},
    q AS (SELECT * FROM base WHERE vec_id % 50 = 0),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN base c ON q.label = c.label AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p) t
    WHERE rank <= 5
    """,
)
def ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell (here the
    ``label`` column stands in for the IVF centroid assignment). The
    cross join becomes a co-partitioned equi-join on the cell id —
    the 100 TB-scale path (cell-bucketed layout → partition-pruned
    probes)."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(
        emb, k=5, query_pred=F.col("vec_id") % 50 == 0, cell_col="label"
    )


@query(
    "emb_neardup_pairs",
    oracle=f"""
    WITH {_BASE_CTE},
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_DOT.format(a="a.embedding", b="b.embedding")} / (a.nrm * b.nrm) AS cosine
      FROM base a JOIN base b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.45
    """,
)
def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ 0.45 on this synthetic
    distribution; production near-dup uses ≥0.95 on real embeddings
    via neardup_pairs_lsh). Exact blocked equi-join — all unordered
    pairs compared exactly once, no CartesianProduct in the plan,
    per-task memory bounded by two id-blocks."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.neardup_pairs(emb, threshold=0.45)


def _lsh_oracle() -> str:
    planes = SIM.hyperplanes(8, 64)
    plane_dots = []
    for j, p in enumerate(planes):
        lit = "[" + ",".join(repr(v) for v in p) + "]"
        dot = (
            "list_reduce(list_prepend(0.0, list_transform(range(1,65),"
            f" i -> embedding[i]::DOUBLE * ({lit}::DOUBLE[])[i])), (x,y) -> x+y)"
        )
        plane_dots.append(f"CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END")
    bucket = " + ".join(plane_dots)
    return f"""
    WITH base AS (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm,
             CAST({bucket} AS BIGINT) AS bucket
      FROM embeddings),
    q AS (SELECT * FROM base WHERE vec_id % 50 = 0),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN base c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p) t
    WHERE rank <= 5
    """


@query("ann_lsh_bucketed", oracle=_lsh_oracle())
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (8 md5-derived random hyperplanes → sign-bit
    bucket → in-bucket exact rerank) — the 100 TB scale path: the
    candidate join co-partitions on the bucket id instead of a cross
    join. Recall is approximate vs ann_cosine_topk by design."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk_lsh(emb, k=5, query_pred=F.col("vec_id") % 50 == 0)


def _ivf_kmeans_oracle(k: int = 8, iters: int = 3, kq: int = 5, mod: int = 50) -> str:
    """DuckDB replay of the FULL Lloyd's k-means fixpoint + IVF probe
    (r8 promotion — the BPE unrolling move applied to k-means): the
    fixed iteration count unrolls into CTE levels, and every float op
    in the loop is reproducible because the operator's centroid mean
    is integer fixed point (Σ floor(x·2^40) exact, then int→double
    and two correctly-rounded divisions — r8 change replacing the
    DECIMAL cast whose decimal→double conversion double-rounds in
    DuckDB). Per level: argmin assignment as list_position of the
    MIN of the per-cell exact INT64 squared-L2 scores over q20
    coords (the _pq_assign metric — first-occurrence = the
    operator's earliest-centroid/numpy-argmin tie-break), then
    per-(cell, pos)
    quantized means with empty cells keeping their previous centroid.
    Early convergence in the operator needs no special case: once
    new == old, further unrolled levels recompute identical
    centroids."""
    q40, q20 = float(1 << 40), float(1 << 20)
    dot = (
        "list_reduce(list_prepend(0.0, list_transform(range(1,65),"
        " i -> {a}[i] * {b}[i])), (x,y) -> x+y)"
    )
    # assignment score: exact INT64 squared L2 over q20 coords against
    # the q20-quantized centroid (r8 _pq_assign metric — k-means is
    # single-subspace PQ); argmin = list_position of the MIN
    score = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(range(1,65),"
        f" i -> (e.qq[i] - CAST(floor(c.c[i] * {q20}) AS BIGINT))"
        f" * (e.qq[i] - CAST(floor(c.c[i] * {q20}) AS BIGINT)))),"
        " (x,y) -> x+y)"
    )
    parts = [f"""
    e AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {q40}) AS BIGINT)) AS q,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {q20}) AS BIGINT)) AS qq
      FROM embeddings),
    c0 AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
             v AS c
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))"""]
    for i in range(1, iters + 1):
        parts.append(f"""
    a{i} AS MATERIALIZED (
      SELECT vec_id, q,
             CAST(list_position(scores, list_min(scores)) - 1 AS INTEGER)
               AS cell
      FROM (
        SELECT e.vec_id, any_value(e.q) AS q,
               list({score} ORDER BY c.cell) AS scores
        FROM e, c{i - 1} c
        GROUP BY e.vec_id)),
    m{i} AS (
      SELECT cell, pos,
             CAST(SUM(qv) AS DOUBLE) / COUNT(*) / {q40} AS m
      FROM (SELECT cell, unnest(q) AS qv,
                   unnest(range(1, len(q) + 1)) AS pos
            FROM a{i})
      GROUP BY 1, 2),
    c{i} AS MATERIALIZED (
      SELECT p.cell, COALESCE(n.c, p.c) AS c
      FROM c{i - 1} p LEFT JOIN
           (SELECT cell, list(m ORDER BY pos) AS c FROM m{i} GROUP BY 1) n
        ON p.cell = n.cell)""")
    parts.append(f"""
    fa AS MATERIALIZED (
      SELECT vec_id,
             CAST(list_position(scores, list_min(scores)) - 1 AS INTEGER)
               AS cell
      FROM (
        SELECT e.vec_id, list({score} ORDER BY c.cell) AS scores
        FROM e, c{iters} c
        GROUP BY e.vec_id)),
    base AS MATERIALIZED (
      SELECT e.vec_id, e.v, fa.cell,
             sqrt({dot.format(a="e.v", b="e.v")}) AS nrm
      FROM e JOIN fa ON e.vec_id = fa.vec_id),
    qs AS (SELECT * FROM base WHERE vec_id % {mod} = 0),
    p AS (
      SELECT qs.vec_id AS query_id, cnd.vec_id AS neighbor_id,
             {dot.format(a="qs.v", b="cnd.v")} / (qs.nrm * cnd.nrm) AS cosine
      FROM qs JOIN base cnd
        ON qs.cell = cnd.cell AND qs.vec_id <> cnd.vec_id)""")
    return (
        "WITH " + ",".join(parts) + f"""
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p) t
    WHERE rank <= {kq}"""
    )


@query("ann_ivf_kmeans", oracle=_ivf_kmeans_oracle(), gate=False)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real IVF: deterministic Lloyd's k-means builds the cells
    (driver-coordinated centroids, argmin assignment as column
    expressions), then cell-restricted exact top-k probes. PROMOTED
    from rows-only in r8: the fixed iteration count unrolls the
    fixpoint into CTE levels (the BPE move), and the r8 switch of the
    centroid mean to integer fixed point removes the one
    cross-engine float seam (DuckDB's double-rounding decimal→double
    cast), so the DuckDB twin replays the ENTIRE clustering — seeds,
    argmin assignments, quantized means, empty-cell carry — plus the
    cell-restricted probe, bit-for-bit. Determinism and recall stay
    pinned by tests/test_dedup_similarity.py."""
    emb = table(spark, sf_dir, "embeddings")
    indexed = SIM.ivf_build(emb, k=8, iters=3)
    return SIM.cosine_topk(
        indexed, k=5, query_pred=F.col("vec_id") % 50 == 0, cell_col="cell"
    )


@query(
    "ann_topk_vectorized",
    oracle="""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0)
                                  AS BIGINT)) AS q
               FROM embeddings),
    qs AS (SELECT vec_id, q FROM e WHERE vec_id % 50 = 0),
    pr AS (SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
                  qs.q AS qa, c.q AS qb
           FROM qs JOIN e c ON c.vec_id <> qs.vec_id),
    sc AS (SELECT query_id, neighbor_id,
                  CAST(SUM(qa[i] * qb[i]) AS BIGINT) AS score
           FROM pr, unnest(range(1, len(qa) + 1)) AS t(i)
           GROUP BY 1, 2),
    r AS (SELECT query_id, neighbor_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id) AS rank
          FROM sc)
    SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= 5
    """,
    gate=False,
)
def ann_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput retrieval: hash-sharded numpy GEMM via cogrouped
    applyInPandas, EXACT and oracle-checked (promoted from rows-only,
    r7 verdict #5). The float-GEMM/IVF-cell variant
    (``cosine_topk_vectorized``) stays the recall-tunable scale path;
    this is its determinism-hardened sibling: coordinates quantize to
    int64 fixed point (floor(double(x)·2²⁰) — float32→double exact,
    one IEEE multiply + floor), candidates shard by xxhash64, each
    task GEMMs one query-block × candidate-shard with numpy INTEGER
    matmul (no BLAS, no sum reassociation — bit-exact), local top-k
    per shard, and a bounded per-query window (n_shards·k rows) merges
    the exact global answer. Nothing reaches the driver; the DuckDB
    twin reproduces every score with a plain positional-sum join."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.dot_topk_vectorized(
        emb, k=5, query_pred=F.col("vec_id") % 50 == 0, n_shards=8
    )


def _semdedup_oracle(n_bits: int = 4, dim: int = 64, scale_bits: int = 20,
                     p_num: int = 1, q_den: int = 4) -> str:
    """DuckDB twin of SIM.semdedup_exact: same md5 ±1 sign planes
    (embedded as literals from the SAME python helper the Spark plan
    uses), same fixed-point quantization, and the greedy min-id prune
    as a recursive CTE — one iteration per in-cell rank, carrying the
    kept-rank list; the similar-pair test is exact HUGEINT
    q²·dot² > p²·‖a‖²·‖b‖²."""
    planes = SIM.sign_planes(n_bits, dim)
    signs_sql = ", ".join(
        f"[{', '.join(str(s) for s in row)}] AS s{b}"
        for b, row in enumerate(planes)
    )
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> qv[i] * h.s{b}[i])) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"""
    WITH RECURSIVE h AS (SELECT {signs_sql}),
    q AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
                 * {float(1 << scale_bits)}) AS BIGINT)) AS qv
      FROM embeddings),
    cellq AS (
      SELECT vec_id, qv, {bit_terms} AS cell,
             list_sum(list_transform(qv, x -> x * x)) AS norm
      FROM q, h),
    ranked AS (
      SELECT vec_id, cell, qv, norm,
             row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rk
      FROM cellq),
    pairs AS (
      SELECT cell, ra, rb FROM (
        SELECT a.cell AS cell, a.rk AS ra, b.rk AS rb,
               list_sum(list_transform(range(1, {dim + 1}),
                   i -> a.qv[i] * b.qv[i])) AS dot,
               a.norm AS na, b.norm AS nb
        FROM ranked a JOIN ranked b ON a.cell = b.cell AND a.rk < b.rk)
      WHERE dot > 0
        AND {q_den * q_den} * CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT)
            > {p_num * p_num} * CAST(na AS HUGEINT) * CAST(nb AS HUGEINT)),
    maxrk AS (SELECT cell, max(rk) AS mx FROM ranked GROUP BY cell),
    greedy AS (
      SELECT cell, CAST(1 AS BIGINT) AS rk, [CAST(1 AS BIGINT)] AS kept
      FROM maxrk
      UNION ALL
      SELECT g.cell, g.rk + 1,
        CASE WHEN EXISTS (
               SELECT 1 FROM pairs p
               WHERE p.cell = g.cell AND p.rb = g.rk + 1
                 AND list_contains(g.kept, p.ra))
             THEN g.kept ELSE list_append(g.kept, g.rk + 1) END
      FROM greedy g JOIN maxrk m ON m.cell = g.cell
      WHERE g.rk < m.mx),
    final AS (
      SELECT g.cell, g.kept FROM greedy g
      JOIN maxrk m ON m.cell = g.cell AND g.rk = m.mx)
    SELECT r.vec_id, r.cell, list_contains(f.kept, r.rk) AS keep
    FROM ranked r JOIN final f ON r.cell = f.cell
    """


@query("semdedup_keep", oracle=_semdedup_oracle())
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then within
    each cluster greedily drop any vector whose cosine to an
    already-kept vector exceeds the threshold (min-id representative
    survives). Runs the determinism-hardened sibling
    ``SIM.semdedup_exact`` — sign-LSH cells from exact integer ±1
    plane dots and a rational-threshold prune in arbitrary-precision
    integers — so every keep/drop bit is reproduced by the DuckDB
    recursive-CTE twin (promoted from rows-only in r8; the paper's
    k-means-cell variant ``SIM.semdedup`` stays engine-tested against
    a pure-python twin in tests/test_semdedup.py — the iterative
    fixpoint itself isn't SQL-expressible). Threshold 1/4 because the
    paper's 0.9 is vacuous on this synthetic corpus (random vectors
    are near-orthogonal); planted-duplicate behavior at high
    thresholds is pinned in tests."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.semdedup_exact(emb, threshold=(1, 4), n_bits=4)


def _pq_adc_oracle(
    m: int = 8, ksub: int = 16, iters: int = 2, kq: int = 5, mod: int = 50
) -> str:
    """DuckDB replay of the WHOLE PQ pipeline (r8 promotion):
    per-subspace Lloyd's rounds unrolled into CTE levels (codebook
    table keyed (sub, code); the operator batches all subspaces into
    one job per round, the oracle into one CTE per round), argmin
    encoding as list_position-of-max over per-code left-fold scores,
    and ADC distances in exact int64 (q20-quantized query coords and
    codebook entries — summation-order-independent, emitted as
    dist/2^40, an exact power-of-two double). Codebook means are the
    operator's r8 integer fixed-point recipe, so every float in the
    fixpoint is reproducible."""
    dsub = 64 // m
    q40, q20 = float(1 << 40), float(1 << 20)
    # assignment scores are exact INT64 squared L2 over q20 coords
    # (r8: _pq_assign) — list_position of the MIN, first occurrence =
    # lowest code, matching numpy argmin
    l2_sub = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, {dsub + 1}),"
        f" i -> (e.qq[b.sub * {dsub} + i] - b.cq[i])"
        f" * (e.qq[b.sub * {dsub} + i] - b.cq[i]))), (x,y) -> x+y)"
    )
    assign = f"""
      SELECT vec_id, sub,
             CAST(list_position(scores, list_min(scores)) - 1 AS INTEGER)
               AS code
      FROM (
        SELECT e.vec_id, b.sub,
               list({l2_sub} ORDER BY b.code) AS scores
        FROM e, {{B}} b
        GROUP BY e.vec_id, b.sub)"""
    parts = [f"""
    e AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {q40}) AS BIGINT)) AS q,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {q20}) AS BIGINT)) AS qq
      FROM embeddings),
    seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS code, v
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {ksub})),
    b0 AS MATERIALIZED (
      SELECT s.sub, seeds.code,
             list_slice(seeds.v, s.sub * {dsub} + 1,
                        s.sub * {dsub} + {dsub}) AS c
      FROM seeds, (SELECT unnest(range(0, {m})) AS sub) s)"""]
    bquant = (
        "(SELECT sub, code, list_transform(c,"
        f" x -> CAST(floor(x * {q20}) AS BIGINT)) AS cq FROM b{{lvl}})"
    )
    for i in range(1, iters + 1):
        parts.append(f"""
    as{i} AS MATERIALIZED ({assign.format(B=bquant.format(lvl=i - 1))}),
    mm{i} AS (
      SELECT a.sub, a.code, p.pos,
             CAST(SUM(e.q[a.sub * {dsub} + p.pos]) AS DOUBLE)
               / COUNT(*) / {q40} AS mn
      FROM as{i} a JOIN e ON a.vec_id = e.vec_id,
           (SELECT unnest(range(1, {dsub + 1})) AS pos) p
      GROUP BY 1, 2, 3),
    b{i} AS MATERIALIZED (
      SELECT pb.sub, pb.code, COALESCE(n.c, pb.c) AS c
      FROM b{i - 1} pb LEFT JOIN
           (SELECT sub, code, list(mn ORDER BY pos) AS c
            FROM mm{i} GROUP BY 1, 2) n
        ON pb.sub = n.sub AND pb.code = n.code)""")
    parts.append(f"""
    bq AS MATERIALIZED (
      SELECT sub, code,
             list_transform(c, x -> CAST(floor(x * {q20}) AS BIGINT)) AS cq
      FROM b{iters}),
    enc AS MATERIALIZED ({assign.format(B="bq")}),
    eq AS MATERIALIZED (
      SELECT vec_id,
             list_transform(v, x -> CAST(floor(x * {q20}) AS BIGINT)) AS qq
      FROM e),
    dist AS (
      SELECT q.vec_id AS query_id, cand.vec_id AS neighbor_id,
             CAST(SUM(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, {dsub + 1}),
                   i -> (q.qq[b.sub * {dsub} + i] - b.cq[i])
                      * (q.qq[b.sub * {dsub} + i] - b.cq[i]))),
                 (x, y) -> x + y)) AS DOUBLE) / {q40} AS adc_dist
      FROM (SELECT * FROM eq WHERE vec_id % {mod} = 0) q
      JOIN eq cand ON cand.vec_id <> q.vec_id
      JOIN enc c ON c.vec_id = cand.vec_id
      JOIN bq b ON b.sub = c.sub AND b.code = c.code
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank
      FROM dist) t
    WHERE rank <= {kq}""")
    return "WITH " + ",".join(parts)


@query("ann_pq_adc", oracle=_pq_adc_oracle(), gate=False)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): per-subspace
    codebooks (8 subspaces × 16 centroids — 8 bytes/vector, 32×
    smaller than the floats), JVM-side encoding, then asymmetric-
    distance top-k via per-chunk LUT scoring (cogrouped numpy, local
    top-k per chunk, windowed global merge — no driver collect, no
    q×n blowup). PROMOTED from rows-only in r8 alongside
    ann_ivf_kmeans: integer fixed-point codebook means + q20 integer
    ADC make every number in the pipeline order-independent, so the
    DuckDB twin replays seeding, both Lloyd's rounds, encoding, and
    the LUT distances bit-for-bit. The exactness anchor
    (codebook-aligned vectors give true L2 within the quantization
    bound), chunk invariance, and the recall floor stay pinned in
    tests/test_pq.py. Measured recall@5 ≈ 0.25 at 8 bytes on this
    synthetic corpus — random near-orthogonal vectors are PQ's
    worst case (no correlation across subspaces to exploit); real
    embedding manifolds quantize far better."""
    emb = table(spark, sf_dir, "embeddings")
    books = SIM.pq_fit(emb, m=8, ksub=16, iters=2)
    return SIM.pq_topk_adc(
        emb, books, k=5, query_pred=F.col("vec_id") % 50 == 0
    )


def _pca_renorm_cte(src: str, dst: str, keys: str) -> str:
    """Two-step magnitude renormalization of an integer CTE column
    ``c`` to max |·| = 2^40 — the exact SQL twin of
    ``intlin.renorm`` (coarse ``// greatest(max // 2^40, 1)`` first so
    the ``· 2^40`` product stays inside HUGEINT, then the exact
    rescale; DuckDB ``//`` truncates toward zero exactly like
    ``intlin.tdiv``)."""
    t = 1 << 40
    return f"""
    {dst}_c1 AS (SELECT {keys},
        c // greatest((SELECT MAX(ABS(c)) FROM {src}) // {t}, 1) AS v1
      FROM {src}),
    {dst} AS MATERIALIZED (
      SELECT {keys},
             CASE WHEN (SELECT MAX(ABS(v1)) FROM {dst}_c1) = 0 THEN v1
                  ELSE (v1 * {t}) // (SELECT MAX(ABS(v1)) FROM {dst}_c1)
             END AS a
      FROM {dst}_c1)"""


def _pca_power_cte(k: int, iters: int) -> str:
    """CTE prefix replaying ``operators.pca.pca_fit`` bit-for-bit:
    integer moments (q20 coords), centered scatter ``cp = n·G −
    s·sᵀ``, truncation to ``a0``, and per component the seed
    (dominant diagonal, ties lowest index), ``iters`` unrolled power-
    iteration levels (``w ← (A·w · 2^15) // max|A·w|``, zero-update
    keeps the previous iterate), sign-fix, exact Rayleigh scalars on
    the original scatter (``rq{c}``), and Hotelling deflation cleared
    of denominators (``ss²·A − t·w·wᵀ``, renormalized). Defines
    ``ex`` (vec_id, pos, xi), ``cnt``, ``sv``, ``cp`` and ``v0..v{k-1}``
    (j, w) — everything a projection or variance report needs."""
    q20f, qv = float(1 << 20), 1 << 15
    parts = [f"""
    ex AS MATERIALIZED (
      SELECT vec_id, CAST(pos1 - 1 AS INTEGER) AS pos,
             CAST(floor(CAST(embedding[pos1] AS DOUBLE) * {q20f})
                  AS HUGEINT) AS xi
      FROM (SELECT vec_id, embedding,
                   unnest(range(1, len(embedding) + 1)) AS pos1
            FROM embeddings)),
    cnt AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings),
    sv AS MATERIALIZED (
      SELECT pos AS j, CAST(SUM(xi) AS HUGEINT) AS s FROM ex GROUP BY 1),
    gm AS MATERIALIZED (
      SELECT a.pos AS i, b.pos AS j, CAST(SUM(a.xi * b.xi) AS HUGEINT) AS g
      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
    cp AS MATERIALIZED (
      SELECT g.i, g.j, (SELECT n FROM cnt) * g.g - si.s * sj.s AS c
      FROM gm g JOIN sv si ON si.j = g.i
                JOIN sv sj ON sj.j = g.j),{_pca_renorm_cte('cp', 'a0', 'i, j')}"""]
    for c in range(k):
        parts.append(f"""
    sd{c} AS (SELECT i AS j FROM a{c} WHERE i = j ORDER BY a DESC, i LIMIT 1),
    w{c}_0 AS MATERIALIZED (
      SELECT DISTINCT i AS j,
             CASE WHEN i = (SELECT j FROM sd{c}) THEN CAST({qv} AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END AS w
      FROM a{c})""")
        for t in range(1, iters + 1):
            parts.append(f"""
    u{c}_{t} AS MATERIALIZED (
      SELECT a.i AS j, SUM(a.a * w.w) AS u
      FROM a{c} a JOIN w{c}_{t - 1} w ON w.j = a.j GROUP BY 1),
    w{c}_{t} AS MATERIALIZED (
      SELECT u.j, CASE WHEN (SELECT MAX(ABS(u)) FROM u{c}_{t}) = 0 THEN pw.w
                  ELSE (u.u * {qv}) // (SELECT MAX(ABS(u)) FROM u{c}_{t})
                  END AS w
      FROM u{c}_{t} u JOIN w{c}_{t - 1} pw ON pw.j = u.j)""")
        parts.append(f"""
    sf{c} AS (SELECT w FROM w{c}_{iters} ORDER BY ABS(w) DESC, j LIMIT 1),
    v{c} AS MATERIALIZED (
      SELECT j, CASE WHEN (SELECT w FROM sf{c}) < 0 THEN -w ELSE w END AS w
      FROM w{c}_{iters}),
    rq{c} AS (SELECT
      (SELECT SUM(wi.w * c.c * wj.w) FROM cp c
         JOIN v{c} wi ON wi.j = c.i JOIN v{c} wj ON wj.j = c.j) AS num,
      (SELECT SUM(w * w) FROM v{c}) AS den)""")
        if c < k - 1:
            parts.append(f"""
    uf{c} AS MATERIALIZED (
      SELECT a.i AS j, SUM(a.a * v.w) AS u
      FROM a{c} a JOIN v{c} v ON v.j = a.j GROUP BY 1),
    tt{c} AS (SELECT
      (SELECT SUM(v.w * u.u) FROM v{c} v JOIN uf{c} u ON u.j = v.j) AS t,
      (SELECT SUM(w * w) FROM v{c}) AS ss),
    df{c} AS MATERIALIZED (
      SELECT a.i, a.j,
             (SELECT ss FROM tt{c}) * (SELECT ss FROM tt{c}) * a.a
             - (SELECT t FROM tt{c}) * wi.w * wj.w AS c
      FROM a{c} a JOIN v{c} wi ON wi.j = a.i
                  JOIN v{c} wj ON wj.j = a.j),{_pca_renorm_cte(f'df{c}', f'a{c + 1}', 'i, j')}""")
    return ",".join(parts)


def _pca_project_oracle(k: int = 4, iters: int = 16) -> str:
    """Twin of pca_embeddings_project: the power-iteration replay plus
    per-vector integer projections, per-label centroid means (exact
    HUGEINT sums → the same correctly-rounded division sequence the
    Spark side uses), and the Rayleigh variance fraction."""
    q35f = float(1 << 35)
    q40f = float(1 << 40)
    pj = ",".join(
        f"""
    pj{c} AS MATERIALIZED (
      SELECT e.vec_id, SUM(e.xi * v.w) AS pcq
      FROM ex e JOIN v{c} v ON v.j = e.pos GROUP BY 1),
    o{c} AS (SELECT (SELECT SUM(s.s * v.w)
                     FROM sv s JOIN v{c} v ON v.j = s.j) AS oq)"""
        for c in range(k)
    )
    nrm = (
        "(sqrt(CAST((SELECT den FROM rq{c}) AS DOUBLE)) / 32768.0)"
    )
    cent = ",\n           ".join(
        f"CAST(SUM(p{c}.pcq) AS DOUBLE) / COUNT(*) / {q35f}"
        f" / {nrm.format(c=c)}"
        f" - (SELECT CAST(oq AS DOUBLE) / (SELECT n FROM cnt) / {q35f}"
        f"    / {nrm.format(c=c)} FROM o{c}) AS centroid_pc{c + 1}"
        for c in range(k)
    )
    joins = " ".join(
        f"JOIN pj{c} p{c} ON p{c}.vec_id = l.vec_id" for c in range(k)
    )
    ev = "(" * (k - 1) + " + ".join(
        f"(SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
        f" / (SELECT n FROM cnt) / ((SELECT n FROM cnt) - 1) / {q40f}"
        f" FROM rq{c})" + (")" if c > 0 else "")
        for c in range(k)
    )
    return f"""
    WITH {_pca_power_cte(k, iters)},{pj},
    tv AS (SELECT CAST((SELECT SUM(c) FROM cp WHERE i = j) AS DOUBLE)
                  / (SELECT n FROM cnt) / ((SELECT n FROM cnt) - 1)
                  / {q40f} AS v)
    SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           {cent},
           {ev} / (SELECT v FROM tv) AS explained_variance_frac
    FROM embeddings l {joins}
    GROUP BY 1
    """


@query("pca_embeddings_project", oracle=_pca_project_oracle(), gate=False)
def pca_embeddings_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA (``operators.pca``): one Arrow-batched pass
    reduces the corpus to per-partition INTEGER second moments (count,
    Σxᵢ, Σxᵢxᵢᵀ — num_partitions rows of d+d² int64s), the driver
    extracts the top-4 directions of the d×d scatter with fixed-count
    power iteration + Hotelling deflation in replayable integer fixed
    point (``operators.intlin``), and projection returns to the
    executors as exact integer JVM folds. PROMOTED from rows-only in
    r9 (the verdict's task #2, by the r8 k-means playbook): the
    LAPACK ``eigh`` was the blocker, and the power-iteration fixpoint
    unrolls into CTE levels — the DuckDB twin replays moments,
    truncation, every iteration, deflation, sign-fix, projection, and
    the per-label centroid means bit-for-bit. The demo projects every
    embedding onto the top-4 components and reports per-label
    projected centroids plus the captured-variance summary — the
    compaction step that fronts the IVF/PQ ANN operators. Subspace
    quality vs numpy eigh stays pinned in tests/test_pca.py."""
    from ..operators.pca import pca_fit, pca_pcq_cols

    emb = table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=4, iters=16)
    proj = emb.select("label", *pca_pcq_cols(model, "embedding"))
    ev = model["explained_variance"]
    frac = ev[0]
    for e in ev[1:]:
        frac = frac + e
    q35 = float(1 << 35)
    return (
        proj.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            *[
                (
                    F.sum(F.col(f"pcq{c + 1}").cast("decimal(38,0)"))
                    .cast("double")
                    / F.count(F.lit(1))
                    / F.lit(q35)
                    / F.lit(float(model["norms"][c]))
                    - F.lit(float(model["offsets"][c]))
                ).alias(f"centroid_pc{c + 1}")
                for c in range(4)
            ],
        )
        .withColumn(
            "explained_variance_frac",
            F.lit(frac / model["total_variance"]),
        )
        .orderBy("label")
    )


@query(
    "knn_label_vote",
    oracle=f"""
    WITH {_BASE_CTE},
    q AS (SELECT * FROM base WHERE vec_id % 50 = 0),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN base c ON q.vec_id <> c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM p) t
      WHERE rank <= 5),
    votes AS (
      SELECT r.query_id, b.label AS pred_label, COUNT(*) AS n_votes
      FROM ranked r JOIN base b ON r.neighbor_id = b.vec_id
      GROUP BY 1, 2),
    pred AS (
      SELECT query_id, pred_label, CAST(n_votes AS BIGINT) AS n_votes
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY n_votes DESC, pred_label) AS pr
            FROM votes) t
      WHERE pr = 1)
    SELECT q.vec_id AS query_id, q.label AS true_label,
           p.pred_label, p.n_votes, (p.pred_label = q.label) AS correct
    FROM q LEFT JOIN pred p ON p.query_id = q.vec_id
    """,
    gate=False,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification
    (``operators.similarity.knn_classify``): every 50th vector is
    auto-labeled from its 5 exact-cosine nearest neighbors (votes
    desc, label asc majority). The top-k result (queries × k rows) is
    broadcast against the corpus label table, so labels are never
    shuffled; swapping in ``cell_col`` turns the candidate scan into
    the partition-pruned IVF path unchanged. The DuckDB oracle
    replays ranking, vote counting, and the majority tie-break."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.knn_classify(emb, k=5, query_pred=F.col("vec_id") % 50 == 0)


@query(
    "emb_quantize_int8",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS x
      FROM (SELECT vec_id, label, embedding,
                   unnest(range(1, len(embedding) + 1)) AS pos
            FROM embeddings)),
    dims AS (
      SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY 1),
    enc AS (
      SELECT e.vec_id, e.label, e.x, d.mn, d.mx,
             CASE WHEN d.mx = d.mn THEN 0
                  ELSE CAST(floor((e.x - d.mn) / (d.mx - d.mn) * 255.0) - 128
                       AS INTEGER) END AS code
      FROM ex e JOIN dims d USING (pos)),
    rec AS (
      SELECT label, x, code,
             CASE WHEN mx = mn THEN mn
                  ELSE least(mn + (code + 128 + 0.5) * (mx - mn) / 255.0, mx)
                  END AS xhat
      FROM enc)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(CAST(floor(abs(x - xhat) * 1000000000.0) AS BIGINT)) AS BIGINT)
             AS sum_abs_err_nano,
           MAX(abs(x - xhat)) AS max_abs_err,
           CAST(MIN(code) AS INTEGER) AS min_code,
           CAST(MAX(code) AS INTEGER) AS max_code
    FROM rec GROUP BY 1
    """,
    gate=False,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (``operators.quantize``): per-dimension
    min-max calibration (a d-row aggregate, broadcast back), floor-
    based encoding (IEEE-exact — no engine-specific rounding rule),
    midpoint dequantization, and the per-label reconstruction-error
    report (decimal-summed MSE, so the reduction order can't perturb
    the hash). The 4-bytes-to-1 compression step in front of ANN
    serving; the PQ operator is the harder-compressing sibling."""
    from ..operators.quantize import quantize_minmax_int8

    emb = table(spark, sf_dir, "embeddings")
    codes = quantize_minmax_int8(emb, "embedding", "vec_id")
    labeled = codes.join(emb.select("vec_id", "label"), "vec_id")
    err = F.col("x") - F.col("xhat")
    return labeled.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_values"),
        # error mass in exact fixed-point (floor of nano-units per value,
        # integer sum): decimal->double conversion is double-rounded in
        # some engines, so the oracle-compared aggregate stays integral
        F.sum(F.floor(F.abs(err) * F.lit(1000000000.0)).cast("bigint")).alias(
            "sum_abs_err_nano"
        ),
        F.max(F.abs(err)).alias("max_abs_err"),
        F.min("code").alias("min_code"),
        F.max("code").alias("max_code"),
    )


def _pca_prefilter_oracle(
    k: int = 8, iters: int = 16, shortlist: int = 50, kq: int = 5,
    mod: int = 50,
) -> str:
    """Twin of ann_pca_prefilter: the k=8 power-iteration replay, the
    exact integer projection per vector (pc doubles identical by
    construction — integer fold, power-of-two division, one IEEE
    subtraction), the coarse top-``shortlist`` in projected space
    (left-fold dot, the knn_label_vote convention), and the exact
    full-vector cosine rerank."""
    q35f = float(1 << 35)
    pj = ",".join(
        f"""
    pj{c} AS MATERIALIZED (
      SELECT e.vec_id, SUM(e.xi * v.w) AS pcq
      FROM ex e JOIN v{c} v ON v.j = e.pos GROUP BY 1),
    o{c} AS (SELECT (SELECT SUM(s.s * v.w)
                     FROM sv s JOIN v{c} v ON v.j = s.j) AS oq)"""
        for c in range(k)
    )
    nrm = (
        "(sqrt(CAST((SELECT den FROM rq{c}) AS DOUBLE)) / 32768.0)"
    )
    pc_elems = ", ".join(
        f"CAST(p{c}.pcq AS DOUBLE) / {q35f} / {nrm.format(c=c)}"
        f" - (SELECT CAST(oq AS DOUBLE) / (SELECT n FROM cnt) / {q35f}"
        f"    / {nrm.format(c=c)} FROM o{c})"
        for c in range(k)
    )
    joins = " ".join(
        f"JOIN pj{c} p{c} ON p{c}.vec_id = p0.vec_id" for c in range(1, k)
    )
    pcdot = (
        f"list_reduce(list_prepend(0.0, list_transform(range(1,{k + 1}),"
        " i -> {a}[i] * {b}[i])), (x,y) -> x+y)"
    )
    return f"""
    WITH {_pca_power_cte(k, iters)},{pj},
    pcv AS MATERIALIZED (
      SELECT p0.vec_id, [{pc_elems}] AS pc
      FROM pj0 p0 {joins}),
    pn AS MATERIALIZED (
      SELECT vec_id, pc, sqrt({pcdot.format(a='pc', b='pc')}) AS pnrm
      FROM pcv),
    cq AS (SELECT * FROM pn WHERE vec_id % {mod} = 0),
    coarse AS (
      SELECT cq.vec_id AS query_id, c.vec_id AS neighbor_id,
             {pcdot.format(a='cq.pc', b='c.pc')} / (cq.pnrm * c.pnrm)
               AS ccos
      FROM cq JOIN pn c ON c.vec_id <> cq.vec_id),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY ccos DESC, neighbor_id) AS rk
        FROM coarse) t
      WHERE rk <= {shortlist}),
    fullv AS MATERIALIZED (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a="embedding", b="embedding")}) AS nrm
      FROM embeddings),
    rr AS (
      SELECT s.query_id, s.neighbor_id,
             {_DOT.format(a="q.embedding", b="c.embedding")}
               / (q.nrm * c.nrm) AS cosine
      FROM short s JOIN fullv q ON q.vec_id = s.query_id
                   JOIN fullv c ON c.vec_id = s.neighbor_id)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM rr) t
    WHERE rank <= {kq}
    """


@query("ann_pca_prefilter", oracle=_pca_prefilter_oracle(), gate=False)
def ann_pca_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality-reduced ANN (``operators.pca.pca_prefilter_topk``):
    coarse top-50 search in 8-dim PCA space (per-candidate fold cost
    drops 8×), exact full-vector cosine rerank of the shortlist. The
    recall/throughput dial between brute force and the IVF/LSH/PQ
    paths; shortlist → corpus reproduces exact (test-pinned).
    PROMOTED from rows-only in r9 with pca_embeddings_project: the
    integer power-iteration fit plus the exact integer projection
    make every coarse score and the shortlist cut engine-independent,
    so the DuckDB twin replays fit → project → coarse top-50 → exact
    rerank bit-for-bit."""
    from ..operators.pca import pca_fit, pca_prefilter_topk

    emb = table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=8, iters=16)
    return pca_prefilter_topk(
        emb, model, k=5, shortlist=50, query_pred=F.col("vec_id") % 50 == 0
    )


_TOK_SQL = "list_filter(string_split_regex(trim(text),'\\s+'), x -> x <> '')"


@query(
    "paired_text_embedding",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang,
             CAST(len({_TOK_SQL}) AS INTEGER) AS n_tokens,
             (CASE WHEN length(regexp_replace(text, '\\s+', '', 'g'))
                        / len({_TOK_SQL}) >= 3.0
                    AND length(regexp_replace(text, '\\s+', '', 'g'))
                        / len({_TOK_SQL}) <= 8.0 THEN 1.0 ELSE 0.0 END
              + least(len(list_filter({_TOK_SQL},
                    x -> list_contains(['the','and','of','to','a'], lower(x))))
                  / CAST(len({_TOK_SQL}) AS DOUBLE) * 4.0, 1.0)
              + 1.0 - least(len(regexp_extract_all(text, '[^\\w\\s]'))
                  / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) / 3.0 AS quality
      FROM documents),
    e AS (
      SELECT vec_id, label,
             sqrt({_DOT.format(a="embedding", b="embedding")}) AS emb_norm
      FROM embeddings)
    SELECT q.doc_id, q.lang, e.label, q.n_tokens, q.quality, e.emb_norm
    FROM q JOIN e ON e.vec_id = q.doc_id
    WHERE q.quality >= 0.4
    """,
    gate=False,
)
def paired_text_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal training-row assembly: join the text corpus with
    its embedding table on the shared id, carry quality + token
    features from the text side and the L2 norm from the vector side,
    and gate on quality — the example-construction step of a
    multimodal/contrastive pipeline. An id-keyed equi-join (both
    sides co-partitionable on the id; with the cell-partitioned
    embedding layout the vector side arrives pruned); the norm is the
    same deterministic fold the ANN operators use."""
    from ..operators import textstats as TS
    from ..operators.similarity import norm_fold

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    q = docs.select(
        "doc_id", "lang",
        TS.token_count("text").alias("n_tokens"),
        TS.quality_score("text").alias("quality"),
    )
    e = emb.select(
        F.col("vec_id").alias("doc_id"), "label",
        norm_fold(F.col("embedding")).alias("emb_norm"),
    )
    return q.join(e, "doc_id").where(F.col("quality") >= 0.4).select(
        "doc_id", "lang", "label", "n_tokens", "quality", "emb_norm"
    )


@query(
    "emb_standardize_dims",
    oracle="""
    WITH ex AS (
      SELECT vec_id, CAST(pos1 - 1 AS INTEGER) AS pos,
             CAST(embedding[pos1] AS DOUBLE) AS x,
             CAST(floor(CAST(embedding[pos1] AS DOUBLE) * 10000) AS BIGINT) AS xi
      FROM (SELECT vec_id, embedding,
                   unnest(range(1, len(embedding) + 1)) AS pos1
            FROM embeddings)),
    stats AS (
      SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xi) AS BIGINT) AS s,
             CAST(SUM(xi * xi) AS BIGINT) AS ss
      FROM ex GROUP BY 1),
    enr AS (
      SELECT pos, n,
             CAST(s AS DOUBLE) / n / 10000 AS mean,
             CAST(n * ss - s * s AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1))
               / CAST(100000000 AS DOUBLE) AS var
      FROM stats),
    outl AS (
      SELECT e.pos,
             CAST(SUM(CASE WHEN abs(e.x - r.mean) > 3.0::DOUBLE * sqrt(r.var)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM ex e JOIN enr r ON e.pos = r.pos GROUP BY 1)
    SELECT e.pos, e.n, e.mean, e.var, o.n_outliers
    FROM enr e JOIN outl o ON e.pos = o.pos
    """,
    gate=False,
)
def emb_standardize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization calibration
    (``operators.quantize.standardize_dims``): mean/variance per
    embedding dimension from INTEGER fixed-point moments (the
    anomaly-detector recipe — Σxi and Σxi² as BIGINT, variance as
    one deterministic double expression) plus a mean±3σ outlier
    census. The z-score pass that precedes whitening or scalar
    quantization; one pos-keyed aggregate + a broadcast d-row
    re-join, zero corpus-keyed shuffles."""
    from ..operators.quantize import standardize_dims

    emb = table(spark, sf_dir, "embeddings")
    return standardize_dims(emb, "embedding", "vec_id")


def _ridge_row_renorm(src: str, dst: str) -> str:
    """Per-ROW two-step magnitude renormalization (each augmented-
    matrix row is an independent equation; row scaling never changes
    the solution) — the SQL twin of ``intlin.renorm`` applied row-wise
    inside ``gauss_solve_fixed``."""
    t = 1 << 40
    return f"""
    {dst}_mx AS (SELECT i, MAX(ABS(val)) AS mx FROM {src} GROUP BY 1),
    {dst}_c1 AS (SELECT r.i, r.j, r.val // greatest(x.mx // {t}, 1) AS v1
                 FROM {src} r JOIN {dst}_mx x ON x.i = r.i),
    {dst}_m1 AS (SELECT i, MAX(ABS(v1)) AS m1 FROM {dst}_c1 GROUP BY 1),
    {dst} AS MATERIALIZED (
      SELECT c.i, c.j, CASE WHEN x.m1 = 0 THEN c.v1
                            ELSE (c.v1 * {t}) // x.m1 END AS val
      FROM {dst}_c1 c JOIN {dst}_m1 x ON x.i = c.i)"""


def _tdiv_sql(num: str, piv: str) -> str:
    """Trunc-toward-zero division with a signed divisor and a zero
    guard — ``intlin.tdiv`` (DuckDB ``//`` already truncates toward
    zero, but only same-sign operands hit the plain branch)."""
    return (
        f"CASE WHEN {piv} = 0 THEN CAST(0 AS HUGEINT) "
        f"WHEN ({num} < 0) = ({piv} < 0) THEN ABS({num}) // ABS({piv}) "
        f"ELSE -(ABS({num}) // ABS({piv})) END"
    )


def _ridge_oracle(d: int = 64, lam: int = 1) -> str:
    """Twin of ridge_probe_embeddings: integer moments, the augmented
    normal-equation system ``(n·G − s·sᵀ + λ·n·2^40·I | n·Xᵀy −
    s·Σy)``, all d−1 fraction-free elimination pivots unrolled into
    CTE levels (single-step Bareiss update + per-row renormalization —
    ``intlin.gauss_solve_fixed`` bit-for-bit), d back-substitution
    levels in trunc-division integer arithmetic, then the exact
    per-label mean predictions, intercept, and moments-based RMSE in
    the operator's correctly-rounded float op sequence."""
    t40 = 1 << 40
    q20f = float(1 << 20)
    q40f = float(t40)
    q50f = float(1 << 50)
    q70f = float(1 << 70)
    parts = [f"""
    ex AS MATERIALIZED (
      SELECT vec_id, CAST(pos1 - 1 AS INTEGER) AS pos,
             CAST(floor(CAST(embedding[pos1] AS DOUBLE) * {q20f})
                  AS HUGEINT) AS xi
      FROM (SELECT vec_id, embedding,
                   unnest(range(1, len(embedding) + 1)) AS pos1
            FROM embeddings)),
    cnt AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings),
    ey AS MATERIALIZED (
      SELECT vec_id, CAST(floor(CAST(label AS DOUBLE) * {q20f})
                          AS HUGEINT) AS yi
      FROM embeddings),
    ys AS (SELECT CAST(SUM(yi) AS HUGEINT) AS sy,
                  CAST(SUM(yi * yi) AS HUGEINT) AS syy FROM ey),
    sv AS MATERIALIZED (
      SELECT pos AS j, CAST(SUM(xi) AS HUGEINT) AS s FROM ex GROUP BY 1),
    gm AS MATERIALIZED (
      SELECT a.pos AS i, b.pos AS j, CAST(SUM(a.xi * b.xi) AS HUGEINT) AS g
      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
    xty AS MATERIALIZED (
      SELECT e.pos AS j, CAST(SUM(e.xi * y.yi) AS HUGEINT) AS v
      FROM ex e JOIN ey y USING (vec_id) GROUP BY 1),
    scat AS MATERIALIZED (
      SELECT g.i, g.j, (SELECT n FROM cnt) * g.g - si.s * sj.s AS c
      FROM gm g JOIN sv si ON si.j = g.i JOIN sv sj ON sj.j = g.j),
    bv AS MATERIALIZED (
      SELECT x.j AS i,
             (SELECT n FROM cnt) * x.v - s.s * (SELECT sy FROM ys) AS val
      FROM xty x JOIN sv s ON s.j = x.j),
    aug AS (
      SELECT i, j, c + CASE WHEN i = j
                 THEN {lam} * (SELECT n FROM cnt) * {t40}
                 ELSE 0 END AS val
      FROM scat
      UNION ALL
      SELECT i, {d} AS j, val FROM bv),{_ridge_row_renorm('aug', 'm0')}"""]
    for p in range(d - 1):
        parts.append(f"""
    raw{p} AS (
      SELECT m.i, m.j,
             m.val * (SELECT val FROM m{p} WHERE i = {p} AND j = {p})
             - rp.val * ip.val AS val
      FROM m{p} m
      JOIN (SELECT j, val FROM m{p} WHERE i = {p}) rp ON rp.j = m.j
      JOIN (SELECT i, val FROM m{p} WHERE j = {p}) ip ON ip.i = m.i
      WHERE m.i > {p}),{_ridge_row_renorm(f'raw{p}', f'upd{p}')},
    m{p + 1} AS MATERIALIZED (
      SELECT i, j, val FROM m{p} WHERE i <= {p}
      UNION ALL SELECT i, j, val FROM upd{p})""")
    fin = f"m{d - 1}"
    num = f"(SELECT val FROM {fin} WHERE i = {d - 1} AND j = {d}) * {1 << 30}"
    piv = f"(SELECT val FROM {fin} WHERE i = {d - 1} AND j = {d - 1})"
    parts.append(f"""
    bb{d - 1} AS (SELECT {d - 1} AS j, {_tdiv_sql(num, piv)} AS b)""")
    for i in range(d - 2, -1, -1):
        num = (
            f"((SELECT val FROM {fin} WHERE i = {i} AND j = {d}) * {1 << 30}"
            f" - (SELECT COALESCE(SUM(r.val * b.b), 0) FROM {fin} r"
            f"    JOIN bb{i + 1} b ON b.j = r.j WHERE r.i = {i} AND r.j > {i}))"
        )
        piv = f"(SELECT val FROM {fin} WHERE i = {i} AND j = {i})"
        parts.append(f"""
    bb{i} AS MATERIALIZED (
      SELECT * FROM bb{i + 1}
      UNION ALL SELECT {i} AS j, {_tdiv_sql(num, piv)} AS b)""")
    parts.append(f"""
    bt AS MATERIALIZED (SELECT j, b FROM bb0),
    sb AS (SELECT (SELECT SUM(s.s * b.b)
                   FROM sv s JOIN bt b ON b.j = s.j) AS v),
    icte AS (SELECT
      CAST((SELECT sy FROM ys) AS DOUBLE) / (SELECT n FROM cnt) / {q20f}
      - CAST((SELECT v FROM sb) AS DOUBLE) / (SELECT n FROM cnt) / {q50f}
        AS ic),
    zc AS (SELECT r.i AS j,
                  {_tdiv_sql('SUM(r.c * b.b)', str(1 << 30))} AS z
           FROM scat r JOIN bt b ON b.j = r.j GROUP BY r.i),
    rmse AS (SELECT
      sqrt(greatest(
        (CAST((SELECT n FROM cnt) * (SELECT syy FROM ys)
              - (SELECT sy FROM ys) * (SELECT sy FROM ys) AS DOUBLE) / {q40f}
         - 2.0 * (CAST((SELECT SUM(b.b * v.val)
                        FROM bt b JOIN bv v ON v.i = b.j) AS DOUBLE) / {q70f}))
        + CAST((SELECT SUM(b.b * z.z)
                FROM bt b JOIN zc z ON z.j = b.j) AS DOUBLE) / {q70f},
        0.0) / (SELECT n FROM cnt) / (SELECT n FROM cnt)) AS r),
    pq AS MATERIALIZED (
      SELECT e.vec_id, SUM(e.xi * b.b) AS p
      FROM ex e JOIN bt b ON b.j = e.pos GROUP BY 1)""")
    return (
        "WITH " + ",".join(parts) + f"""
    SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n,
           (SELECT ic FROM icte)
             + CAST(SUM(p.p) AS DOUBLE) / COUNT(*) / {q50f}
             AS mean_prediction,
           (SELECT r FROM rmse) AS train_rmse,
           CAST((SELECT n FROM cnt) AS BIGINT) AS model_n
    FROM embeddings l JOIN pq p ON p.vec_id = l.vec_id
    GROUP BY 1
    """
    )


@query("ridge_probe_embeddings", oracle=_ridge_oracle(), gate=False)
def ridge_probe_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear probe over frozen embeddings
    (``operators.linear.ridge_fit``): closed-form ridge regression of
    the label from the embedding — ONE Arrow pass of per-partition
    INTEGER sufficient statistics (n, Σx, Σy, Σy², XᵀX, Xᵀy; bounded
    d²-size partials), a driver-side fraction-free Gaussian
    elimination in replayable integer fixed point
    (``operators.intlin.gauss_solve_fixed``), then pure map-side JVM
    scoring via the exact integer prediction fold. PROMOTED from
    rows-only in r9 (the verdict's task #4): the LAPACK normal-
    equation solve was the last linear-algebra blocker, and the
    elimination's d−1 pivots + d back-substitution steps unroll into
    CTE levels — the DuckDB twin replays moments, every pivot, every
    coefficient, the intercept, per-label mean predictions, and the
    moments-based training RMSE bit-for-bit. Reports per-label
    prediction means and the training RMSE — the 'are these
    embeddings linearly informative?' audit every embedding pipeline
    runs. Coefficient quality vs the numpy closed form stays pinned
    in tests/test_linear.py."""
    from ..operators.linear import ridge_fit, ridge_pq_col

    emb = table(spark, sf_dir, "embeddings")
    model = ridge_fit(emb, "label", lam=1.0)
    q50 = float(1 << 50)
    scored = emb.select(
        "label", ridge_pq_col(model, "embedding").alias("_pq")
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.lit(float(model["intercept"]))
                + F.sum(F.col("_pq").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(q50)
            ).alias("mean_prediction"),
        )
        .withColumn("train_rmse", F.lit(model["rmse"]))
        .withColumn("model_n", F.lit(model["n"]).cast("bigint"))
    )


@query(
    "emb_label_centroids",
    oracle="""
    WITH ex AS (
      SELECT label, CAST(pos1 - 1 AS INTEGER) AS pos,
             CAST(floor(CAST(embedding[pos1] AS DOUBLE) * 1000000) AS BIGINT) AS xi
      FROM (SELECT label, embedding,
                   unnest(range(1, len(embedding) + 1)) AS pos1
            FROM embeddings WHERE label IS NOT NULL)),
    cent AS (
      SELECT label, pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xi) AS BIGINT) AS s
      FROM ex GROUP BY 1, 2)
    SELECT label, pos, n,
           CAST(s AS DOUBLE) / n / 1000000 AS centroid
    FROM cent
    """,
    gate=False,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype table
    behind nearest-centroid classification, SemDeDup-style cluster
    seeding, and drift monitoring between corpus slices. Sums run in
    integer FIXED-POINT (``Σ floor(v·10⁶)`` as BIGINT — order-
    independent, so the centroid itself is oracle-hashable; a raw
    double sum would diverge from DuckDB in the last ulp under
    different partial-agg orders). One posexplode + ONE
    (label, dim)-keyed shuffle; output is labels × d rows — a
    prototype table small enough to broadcast into a scoring join."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.where(F.col("label").isNotNull()).select(
        "label", F.posexplode("embedding").alias("pos", "x")
    )
    xi = F.floor(F.col("x").cast("double") * 1000000).cast("bigint")
    return (
        ex.select("label", "pos", xi.alias("xi"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("xi").cast("bigint").alias("s"),
        )
        .select(
            "label",
            "pos",
            "n",
            (F.col("s").cast("double") / F.col("n") / F.lit(1000000)).alias("centroid"),
        )
    )


@query(
    "emb_nearest_centroid_eval",
    oracle="""
    WITH ex AS (
      SELECT label, CAST(pos1 - 1 AS INTEGER) AS pos,
             CAST(floor(CAST(embedding[pos1] AS DOUBLE) * 1000000) AS BIGINT) AS xi
      FROM (SELECT label, embedding,
                   unnest(range(1, len(embedding) + 1)) AS pos1
            FROM embeddings WHERE label IS NOT NULL)),
    cent AS (
      SELECT label, pos, CAST(SUM(xi) AS DOUBLE) / COUNT(*) / 1000000 AS c
      FROM ex GROUP BY 1, 2),
    cvec AS (SELECT label AS clabel, list(c ORDER BY pos) AS cv
             FROM cent GROUP BY 1),
    d AS (
      SELECT e.vec_id, e.label, c.clabel,
             list_reduce(
               list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(e.embedding) + 1),
                   i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
                      * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]))),
               (acc, x) -> acc + x) AS dist
      FROM embeddings e, cvec c WHERE e.label IS NOT NULL),
    pick AS (
      SELECT vec_id, label, clabel,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rn
      FROM d)
    SELECT label, clabel AS pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM pick WHERE rn = 1 GROUP BY 1, 2
    """,
    gate=False,
)
def emb_nearest_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification confusion matrix — the
    prototype classifier the per-label centroid table exists for
    (Rocchio / nearest-class-mean): every labeled embedding is
    assigned to its closest class centroid (squared L2, ties to the
    smaller label) and the (label, pred) counts form the confusion
    matrix. Distances are LEFT-FOLD double sums over fixed-point-
    derived centroids, so both engines produce bit-identical
    distances and the argmin is oracle-checkable.

    Scale: the prototype table is labels × d (broadcast — bounded by
    the label space); the scan side pays one JVM fold per (vector,
    class) pair and ONE vec-keyed argmin aggregate (min over
    (dist, label) structs — mergeable, no window)."""
    emb = table(spark, sf_dir, "embeddings").where(F.col("label").isNotNull())
    cent = emb_label_centroids(spark, sf_dir)
    cvec = cent.groupBy(F.col("label").alias("clabel")).agg(
        F.expr(
            "transform(sort_array(collect_list(struct(pos, centroid))), s -> s.centroid)"
        ).alias("cv")
    )
    dist = F.aggregate(
        F.zip_with(
            "embedding", "cv", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    d = emb.crossJoin(F.broadcast(cvec)).select(
        "vec_id", "label", "clabel", dist.alias("dist")
    )
    pick = (
        d.groupBy("vec_id", "label")
        .agg(F.min(F.struct("dist", "clabel")).alias("_m"))
        .select("label", F.col("_m.clabel").alias("pred"))
    )
    return pick.groupBy("label", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@query(
    "retrieval_eval_knn",
    oracle=f"""
    WITH {_BASE_CTE},
    q AS (SELECT * FROM base WHERE vec_id % 50 = 0),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_DOT.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM q JOIN base c ON q.vec_id <> c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        FROM p) t
      WHERE rank <= 5),
    tr AS (SELECT q.vec_id AS query_id, c.vec_id AS item
           FROM q JOIN base c ON c.label = q.label AND c.vec_id <> q.vec_id),
    nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS nrel
             FROM tr GROUP BY 1),
    hits AS (SELECT r.query_id, r.rank
             FROM ranked r JOIN tr t
               ON t.query_id = r.query_id AND t.item = r.neighbor_id),
    perq AS (
      SELECT d.query_id,
             COALESCE(h.nhit, 0) AS nhit,
             COALESCE(n.nrel, 0) AS nrel,
             COALESCE(1073741824 // h.first, 0) AS rrq
      FROM (SELECT DISTINCT query_id FROM ranked) d
      LEFT JOIN (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS nhit,
                        CAST(MIN(rank) AS BIGINT) AS first
                 FROM hits GROUP BY 1) h USING (query_id)
      LEFT JOIN nrel n USING (query_id))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(rrq) AS DOUBLE) / COUNT(*) / 1073741824.0 AS mrr,
           CAST(SUM(CASE WHEN LEAST(nrel, 5) > 0
                         THEN nhit * 1073741824 // LEAST(nrel, 5)
                         ELSE 0 END) AS DOUBLE) / COUNT(*) / 1073741824.0
             AS recall_at_5,
           CAST(SUM(nhit) AS DOUBLE) / COUNT(*) / 5.0 AS precision_at_5
    FROM perq
    """,
    gate=False,
)
def retrieval_eval_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANKING EVALUATION (``operators.retrieval.ranking_eval``) —
    the metrics side every ANN/retrieval index needs: exact
    brute-force cosine top-5 scored against same-label relevance,
    reporting MRR, R-capped recall@5, and precision@5. Per-query
    numbers are exact integers (q30 reciprocal ranks and recall
    shares — trunc division is the only rounding, replayable on any
    engine); the corpus-level means are single correctly-rounded
    double divisions. De-expanded in r10 (``ranking_eval_labeled``):
    the |Q|·(corpus/label) truth expansion is gone — relevant counts
    come from a broadcast label histogram and hits from joining the
    ≤ k·|Q| result rows back to the embeddings on neighbor id; same
    metrics, same oracle, no skew-sensitive intermediate."""
    from ..operators.retrieval import ranking_eval_labeled

    emb = table(spark, sf_dir, "embeddings")
    results = SIM.cosine_topk(
        emb, k=5, query_pred=F.col("vec_id") % 50 == 0
    ).select("query_id", "neighbor_id", "rank")
    return ranking_eval_labeled(
        results, emb.select("vec_id", "label"), k=5
    )


def _kcenter_oracle(k: int = 8, dim: int = 64, scale_bits: int = 20) -> str:
    """DuckDB twin of SIM.kcenter_greedy: k unrolled farthest-point
    levels — each one cross-joins the 1-row previously-chosen center
    into an exact integer min-distance update (list_sum of per-dim
    squared diffs over the q20 coords), then picks the (mind DESC,
    vec_id ASC) top-1. Bit-for-bit the operator's update."""

    def dist(a: str, c: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}),"
            f" i -> ({a}.qv[i] - {c}.qv[i]) * ({a}.qv[i] - {c}.qv[i])))"
        )

    parts = [f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * {float(1 << scale_bits)})
               AS BIGINT)) AS qv
      FROM embeddings),
    c0 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
    d1 AS MATERIALIZED (
      SELECT a.vec_id, a.qv, {dist('a', 'c')} AS mind
      FROM q a, c0 c)"""]
    for t in range(1, k):
        parts.append(f""",
    c{t} AS (SELECT vec_id, qv, mind FROM d{t}
             ORDER BY mind DESC, vec_id LIMIT 1)""")
        if t < k - 1:
            parts.append(f""",
    d{t + 1} AS MATERIALIZED (
      SELECT a.vec_id, a.qv, least(a.mind, {dist('a', 'c')}) AS mind
      FROM d{t} a, c{t} c)""")
    sels = [
        "SELECT CAST(0 AS INTEGER) AS sel_round, vec_id,"
        " CAST(0 AS BIGINT) AS mind_q FROM c0"
    ]
    for t in range(1, k):
        sels.append(
            f"SELECT CAST({t} AS INTEGER), vec_id, CAST(mind AS BIGINT)"
            f" FROM c{t}"
        )
    parts.append("\n" + "\nUNION ALL\n".join(sels))
    return "".join(parts)


@query("coreset_kcenter_embeddings", oracle=_kcenter_oracle(), gate=False)
def coreset_kcenter_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CENTER CORESET SELECTION (``SIM.kcenter_greedy``): the 8
    maximally-spread embedding representatives by Gonzalez
    farthest-point traversal — the diversity-pruning primitive
    (coreset selection / facility-location family) that complements
    near-dup REMOVAL: instead of dropping what is too close, pick the
    set that covers the space, with the selection-time coverage
    radius reported per round. Exact integer squared-L2 over q20
    fixed-point coords; each greedy level is one map-side pass + a
    TakeOrdered(1) merge, chosen centers ride as in-plan literals, and
    the DuckDB twin unrolls all 8 levels."""
    emb = table(spark, sf_dir, "embeddings")
    return SIM.kcenter_greedy(emb, k=8)
