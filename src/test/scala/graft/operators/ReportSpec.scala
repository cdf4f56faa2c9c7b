package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("dataCard: every metric exact on a handcrafted corpus") {
    val docs = Seq(
      (1L, "same text here", "en", "web", 14L),
      (2L, "same text here", "en", "web", 14L),  // exact dup of 1
      (3L, "unique one", "en", "books", 10L),
      (4L, "unico dos", "es", "web", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val events = Seq(
      (1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (5L, 20L), (6L, 30L)
    ).toDF("event_id", "user_id")
    val emb = Seq(
      (1L, Array(0.5f, 0.25f)),
      (2L, Array(1.0f, 0.25f))  // dim1 constant -> dead
    ).toDF("vec_id", "embedding")
    val got = Report.dataCard(docs, events, emb)
      .as[(String, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("docs_n") == ((4.0, "")))
    assert(got("docs_chars_total") == ((47.0, "")))
    assert(got("docs_sources_n") == ((2.0, "")))
    assert(got("docs_langs_n") == ((2.0, "")))
    assert(got("docs_lang_top_share") == ((3.0 / 4, "en")))
    assert(got("dup_exact_groups") == ((1.0, "")))
    assert(got("dup_exact_rate") == ((1.0 / 4, "")))
    assert(got("events_n") == ((6.0, "")))
    assert(got("events_users_n") == ((3.0, "")))
    assert(got("events_per_user") == ((2.0, "")))
    assert(got("vectors_n") == ((2.0, "")))
    assert(got("vectors_dims") == ((2.0, "")))
    assert(got("vectors_dead_dims") == ((1.0, "")))
    assert(got.size == 13)
  }

  test("dataCard lang mode tie breaks to the larger lang string") {
    val docs = Seq(
      (1L, "a", "en", "w", 1L), (2L, "b", "es", "w", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val events = Seq((1L, 1L)).toDF("event_id", "user_id")
    val emb = Seq((1L, Array(0.5f))).toDF("vec_id", "embedding")
    val top = Report.dataCard(docs, events, emb)
      .filter(col("metric") === "docs_lang_top_share")
      .as[(String, Double, String)].head()
    assert(top == (("docs_lang_top_share", 0.5, "es")))
  }
}
