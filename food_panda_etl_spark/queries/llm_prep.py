"""The LLM-data-pipeline COMPOSITE (VERDICT r4 task 3): one declared
lineage chaining every §2.10 preparation stage over ``documents`` —

    clean → language-ID → quality filter → exact dedup →
    near-dup CC keep-rep → train/val/test split → sequence packing

— oracled end-to-end as chained DuckDB CTEs. Each stage reuses the
already-oracled building block (`queries/text.py` clean/langid,
`queries/aggregates.py` two-hash exact dedup, `operators/dedup.py`
LSH-verified pairs + `operators/components.py` keep-rep,
`queries/storage.py` hash-bucket split + prefix-sum packing); the
composite proves the stages COMPOSE — filters feed dedup feeds packing —
with a single hash-match, the §2.10 analog of `q_vendor_enrich`
(the reference-parity composite, /root/reference/src/main.rs:86-156's
fetch→transform→sink lineage re-expressed over training data).

The fixture corpus has no byte-identical texts, which would leave the
exact-dedup stage vacuously green — so the composite INJECTS
deterministic duplicates first (every 37th doc re-keyed +10000, the
`q_snapshot_diff` derivation trick). The dedup stage must drop exactly
those rows: min-id wins, so every injected key vanishing from the output
is driver-visible evidence the stage ran.

100 TB posture: clean/langid/quality are narrow maps in the scan
projection; dedup shuffles 8-byte hashes (payload only as min(text)
once per group); near-dup pairs come from banded MinHash candidates
(equi-join, verify on candidates only); split/pack are a projection +
the range-partitioned prefix sum. No stage collects to the driver
except CC's convergence scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_CHUNK = 2048

# --- shared stage fragments (DuckDB side) --------------------------------

# NB: the email character class must match queries/text.py EXACTLY;
# assembled here once and verified by the driver hash (a divergence in
# either regex is a mismatch on any doc containing an email).
_CLEAN = r"""trim(regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^ ]+', '<URL>', 'g'),
           ' +', ' ', 'g'))"""


def _hits(words: list[str]) -> str:
    ws = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(ct,' '), x -> x IN ({ws})))"


_S_EN = _hits(["the", "and", "of"])
_S_ES = _hits(["el", "la", "de"])
_S_DE = _hits(["der", "die", "und"])
_BEST = f"greatest({_S_EN}, {_S_ES}, {_S_DE})"

_LLM_PREP_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 37 = 0),
cleaned AS (SELECT doc_id, {_CLEAN} AS ct FROM base),
tagged AS (
  SELECT doc_id, ct,
         CAST(len(string_split(ct,' ')) AS BIGINT) AS n_tokens,
         CASE WHEN {_BEST} = 0 THEN 'und'
              WHEN {_S_EN} = {_BEST} THEN 'en'
              WHEN {_S_ES} = {_BEST} THEN 'es'
              ELSE 'de' END AS lang
  FROM cleaned),
quality AS (SELECT * FROM tagged WHERE n_tokens >= 20 AND lang <> 'und'),
deduped AS (
  SELECT doc_id, ct, n_tokens, lang FROM quality
  QUALIFY row_number() OVER (PARTITION BY ct ORDER BY doc_id) = 1),
sh AS (
  SELECT DISTINCT doc_id AS doc, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(string_split(ct,' ')) - 4, 0)),
             i -> string_split(ct,' ')[i] || ' ' || string_split(ct,' ')[i+1] || ' ' ||
                  string_split(ct,' ')[i+2] || ' ' || string_split(ct,' ')[i+3] || ' ' ||
                  string_split(ct,' ')[i+4])) AS shingle
    FROM deduped) WHERE shingle <> ''),
shsizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
          GROUP BY 1, 2),
nd AS (
  SELECT doc_a, doc_b FROM inter
  JOIN shsizes sa ON doc_a = sa.doc
  JOIN shsizes sb ON doc_b = sb.doc
  WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.8),
edges AS (SELECT doc_a AS a, doc_b AS b FROM nd UNION ALL SELECT doc_b, doc_a FROM nd),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM deduped
  UNION
  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
csize AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component),
reps AS (
  SELECT d.doc_id, d.lang, d.n_tokens, s.cluster_size
  FROM deduped d
  JOIN comp c ON d.doc_id = c.doc_id
  JOIN csize s ON c.component = s.component
  WHERE c.doc_id = c.component),
packed AS (
  SELECT doc_id, lang, n_tokens, cluster_size,
         SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM reps)
SELECT doc_id, lang, n_tokens, CAST(cluster_size AS BIGINT) AS cluster_size,
       CASE WHEN ((doc_id % 1000) * 761) % 1000 < 800 THEN 'train'
            WHEN ((doc_id % 1000) * 761) % 1000 < 900 THEN 'val'
            ELSE 'test' END AS split,
       CAST((cum - n_tokens) // {_CHUNK} AS BIGINT) AS chunk_start,
       CAST((cum - 1) // {_CHUNK} AS BIGINT) AS chunk_end
FROM packed
"""


@query("q_llm_prep", oracle=_LLM_PREP_ORACLE)
def q_llm_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data preparation lineage (docstring at
    module top). Every intermediate column the next stage needs travels
    in the frame; nothing materializes driver-side except the CC
    convergence scalar."""
    from food_panda_etl_spark.operators.components import (
        dedup_keep_representative,
    )
    from food_panda_etl_spark.operators.dedup import verified_jaccard_pairs_lsh
    from food_panda_etl_spark.operators.order import global_running_sum
    from food_panda_etl_spark.queries.text import language_id

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Stage 0 — inject deterministic exact duplicates (see module doc).
    dups = d.filter(F.col("doc_id") % 37 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    # Repartition-first parallelism (the dedup.tokenized() pattern,
    # r19): the corpus arrives as few parquet splits, and without the
    # exchange the triple-regex clean + langid + dedup-hash chain — the
    # composite's per-row hot path — runs on as many cores as there
    # were input files (measured: two 3.3 s tasks at sf0.1 while 30
    # cores idled). One narrow (id, text) shuffle buys full width.
    par = spark.sparkContext.defaultParallelism
    base = d.unionByName(dups).repartition(par, "doc_id")

    # Stage 1 — clean (same chain as q_text_clean, over the union).
    cleaned = base.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("text"),
                        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                        "<EMAIL>",
                    ),
                    r"https?://[^ ]+",
                    "<URL>",
                ),
                r" +",
                " ",
            )
        ).alias("ct"),
    )

    # Stage 2 — language-ID on the CLEANED text (queries/text.py heuristic).
    tagged = cleaned.select(
        "doc_id",
        "ct",
        F.size(F.split(F.col("ct"), " ")).cast("long").alias("n_tokens"),
        language_id(cleaned, "ct").alias("lang"),
    )

    # Stage 3 — quality filter (Gopher-style minimum length + known lang).
    # Checkpointed (r20): the triple-regex clean + langid chain above is
    # the composite's per-row hot path, and `quality` feeds THREE
    # independent subtrees (the dedup hash agg, the collision-rescue
    # branch of keep_ids, and the survivors semi-join) across the many
    # jobs CC/packing launch — profiled at sf0.1 the chain re-executed
    # per consumer (~45 executor-seconds total for a ~13 s chain).
    # One lazy materialization cuts every re-run (guide §5: reuse vs
    # recompute; the survivors/connected_components convention).
    quality = tagged.filter(
        (F.col("n_tokens") >= 20) & (F.col("lang") != "und")
    ).localCheckpoint(eager=False)

    # Stage 4 — exact dedup, the q_dedup two-hash discipline: shuffle an
    # 8-byte xxhash64(ct), never the payload; a second independent hash
    # proves group purity (min==max ⇒ all texts identical up to a 2⁻¹²⁸
    # double collision); colliding first-hashes re-group exactly by text
    # (AQE eliminates the empty branch at runtime).
    hashed = quality.withColumn("__h", F.xxhash64("ct")).withColumn(
        "__h2", F.xxhash64("ct", F.lit(1))
    )
    g = hashed.groupBy("__h").agg(
        F.min("doc_id").alias("keep_id"),
        F.min("__h2").alias("__h2min"),
        F.max("__h2").alias("__h2max"),
    )
    keep_ids = (
        g.filter(F.col("__h2min") == F.col("__h2max"))
        .select("keep_id")
        .unionByName(
            hashed.join(
                F.broadcast(
                    g.filter(F.col("__h2min") != F.col("__h2max")).select("__h")
                ),
                "__h",
            )
            .groupBy("ct")
            .agg(F.min("doc_id").alias("keep_id"))
            .select("keep_id")
        )
    )
    # The survivor frame feeds three consumers (shingle/signature tables,
    # the keep-rep docs side, and — through reps — the packing prefix
    # sum), and CC + global_running_sum each run multiple jobs: without a
    # checkpoint the regex-clean + langid + dedup lineage re-executes per
    # job. Lazy localCheckpoint materializes it once, on the first
    # action (same pattern as connected_components' edge table).
    survivors = quality.join(
        keep_ids.withColumnRenamed("keep_id", "doc_id"), "doc_id", "semi"
    ).localCheckpoint(eager=False)

    # Stage 5 — near-dup delete: banded-MinHash candidates → true-Jaccard
    # verify (the declared 100 TB pair path) → CC keep-rep with the
    # cluster-size audit column.
    pairs = verified_jaccard_pairs_lsh(
        survivors, "doc_id", "ct", n=5, threshold=0.8, num_hashes=32, bands=16
    )
    reps = dedup_keep_representative(
        survivors.select("doc_id", "lang", "n_tokens"), pairs
    )

    # Stage 6 — deterministic split (q_train_split's overflow-free
    # multiplicative hash; engine- and partitioning-invariant).
    bucket = ((F.col("doc_id") % 1000) * F.lit(761)) % 1000
    with_split = reps.withColumn(
        "split",
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test"),
    )

    # Stage 7 — sequence packing over the SURVIVING corpus in doc_id
    # order: range-partitioned global prefix sum (no single-partition
    # window), chunk ids by integer arithmetic.
    cum = global_running_sum(with_split, ["doc_id"], "n_tokens", "cum")
    start = F.col("cum") - F.col("n_tokens")
    last = F.col("cum") - 1
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "split",
        ((start - F.pmod(start, F.lit(_CHUNK))) / _CHUNK)
        .cast("long")
        .alias("chunk_start"),
        ((last - F.pmod(last, F.lit(_CHUNK))) / _CHUNK)
        .cast("long")
        .alias("chunk_end"),
    )
