package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dataset "data card" — the one-artifact corpus summary published next
 * to a training-data release: corpus volume, language / source mix,
 * exact-duplication rate, event-stream shape, embedding-space health.
 * Every number is derived from exact integer aggregates and only cast
 * to DOUBLE at the edge (shares are integer÷integer in one IEEE
 * division), so the whole card is oracle-replayable.
 *
 * Output contract: (metric STRING, value DOUBLE, detail STRING) —
 * `detail` carries the argument where one exists (e.g. WHICH language
 * dominates), empty string otherwise.
 *
 * Scale shape: one aggregate pass per input table (multi-metric rows
 * unpivoted with `stack`, so the pass count stays 5 as metrics grow),
 * one keyed count for the language mode, the exact-dedup groupBy on
 * 16-byte digests, and the O(dim) dimStats rollup — every pass
 * map-side combinable; the unioned card is ~a dozen rows.
 */
object Report {

  def dataCard(docs: DataFrame, events: DataFrame,
               embeddings: DataFrame): DataFrame = {
    val d = lit("")
    val docsPass = docs
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        countDistinct(col("source")).as("srcs"),
        countDistinct(col("lang")).as("langs"))
      .selectExpr("""stack(4,
        'docs_n', CAST(n AS DOUBLE), '',
        'docs_chars_total', CAST(chars AS DOUBLE), '',
        'docs_sources_n', CAST(srcs AS DOUBLE), '',
        'docs_langs_n', CAST(langs AS DOUBLE), '') AS (metric, value, detail)""")
    val langTop = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .agg(max_by(col("lang"), struct(col("cnt"), col("lang"))).as("top"),
        max(struct(col("cnt"), col("lang"))).getField("cnt").as("top_cnt"),
        sum(col("cnt")).as("n"))
      .select(lit("docs_lang_top_share").as("metric"),
        (col("top_cnt").cast("double") / col("n")).as("value"),
        col("top").as("detail"))
    val dup = Dedup.exactGroups(docs)
      .agg(sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("g"),
        sum(col("n_copies") - 1).as("extra"), sum(col("n_copies")).as("n"))
      .selectExpr("""stack(2,
        'dup_exact_groups', CAST(g AS DOUBLE), '',
        'dup_exact_rate', CAST(extra AS DOUBLE) / n, '') AS (metric, value, detail)""")
    val ev = events
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .selectExpr("""stack(3,
        'events_n', CAST(n AS DOUBLE), '',
        'events_users_n', CAST(u AS DOUBLE), '',
        'events_per_user', CAST(n AS DOUBLE) / u, '') AS (metric, value, detail)""")
    val em = embeddings
      .agg(count(lit(1)).as("n"), max(size(col("embedding"))).as("dims"))
      .selectExpr("""stack(2,
        'vectors_n', CAST(n AS DOUBLE), '',
        'vectors_dims', CAST(dims AS DOUBLE), '') AS (metric, value, detail)""")
    val dead = Similarity.dimStats(embeddings)
      .filter(col("min_q") === col("max_q"))
      .agg(count(lit(1)).as("k"))
      .select(lit("vectors_dead_dims").as("metric"),
        col("k").cast("double").as("value"), d.as("detail"))
    docsPass.unionByName(langTop).unionByName(dup).unionByName(ev)
      .unionByName(em).unionByName(dead)
      .orderBy(col("metric"))
  }
}
