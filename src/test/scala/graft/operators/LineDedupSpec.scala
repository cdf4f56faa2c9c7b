package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TextOps.lineDedup]] — C4/RefinedWeb cross-document line-level
  * boilerplate removal. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup drops corpus-frequent lines, keeps df<=maxDf and short lines") {
    // boilerplate "all rights reserved today" in ALL 4 docs (df=4 > 2);
    // "promo pair line here" in exactly 2 docs (df=2 == maxDf: kept);
    // "--" everywhere but short (exempt); bodies unique
    val docs = Seq(
      (1L, "body one alpha\nall rights reserved today\npromo pair line here\n--"),
      (2L, "body two beta\nall rights reserved today\npromo pair line here\n--"),
      (3L, "body three gamma\nall rights reserved today\n--"),
      (4L, "body four delta\nall rights reserved today\n--")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs, maxDf = 2, minLineChars = 10)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, "body one alpha\npromo pair line here\n--"),
      (2L, 3L, 1L, "body two beta\npromo pair line here\n--"),
      (3L, 2L, 1L, "body three gamma\n--"),
      (4L, 2L, 1L, "body four delta\n--")), got.mkString("\n"))
  }

  test("lineDedup: trimming keys, all-boilerplate docs go empty, order preserved") {
    val docs = Seq(
      // indented copies still match the trimmed key; kept lines
      // reassemble in ORIGINAL order (and keep their original spacing)
      (1L, "  shared cookie banner line\nzz last\naa first"),
      (2L, "shared cookie banner line  \nmiddle unique"),
      (3L, "shared cookie banner line"),
      (4L, "shared cookie banner line\nshared cookie banner line")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs, maxDf = 2, minLineChars = 10)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, "zz last\naa first"), // NOT alphabetical — positional
      (2L, 1L, 1L, "middle unique"),
      (3L, 0L, 1L, ""),
      (4L, 0L, 2L, "")), got.mkString("\n")) // both occurrences drop
  }

  test("lineDedup conservation: kept + dropped = input lines, on real docs") {
    // every input line is accounted for exactly once — over real
    // document bodies with injected boilerplate (the ScaleCheck probe
    // corpus shape)
    val docs = graft.sources.ChangeLogSource
      .table(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("text", concat(
        lit("all rights reserved worldwide notice\n"), col("text"),
        lit("\nsubscribe to our newsletter today")))
    val bad = TextOps.lineDedup(docs)
      .join(docs.select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_in")), "doc_id")
      .filter(col("n_lines_kept") + col("n_lines_dropped") =!= col("n_in"))
      .count()
    assert(bad == 0L)
    // and the boilerplate is gone from every reassembled doc
    val leaked = TextOps.lineDedup(docs)
      .filter(col("clean_text").contains("rights reserved") ||
        col("clean_text").contains("subscribe to our newsletter"))
      .count()
    assert(leaked == 0L)
  }

  test("lineDedup: null text and single-doc corpus pass through") {
    val docs = Seq((1L, null: String), (2L, "only doc line content"))
      .toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, ""), (2L, 1L, 0L, "only doc line content")))
  }

  test("lineQuality: C4 line rules — terminal punct, word floor, js; page flags") {
    val text = Seq(
      "This sentence has enough words and ends well.", // keep
      "Short line.",                                   // < 5 words
      "this line has plenty of words but no ending",   // no terminal punct
      "Does a question mark count as terminal here?",  // keep
      "Enable javascript to view this site please.",   // js mention
      "He said \"the quote ends the line here.\"",     // keep (closing ")
      "   Trailing spaces still count as terminal.  ", // keep (trimmed)
      "").mkString("\n")
    val got = TextOps.lineQuality(Seq((1L, text)).toDF("doc_id", "text"))
      .select($"n_lines_kept", $"n_lines_dropped", $"has_curly",
        $"has_lorem", $"clean_text")
      .as[(Long, Long, Boolean, Boolean, String)].head()
    assert(got._1 == 4L && got._2 == 4L, got.toString)
    assert(!got._3 && !got._4)
    assert(got._5.linesIterator.size == 4 &&
      got._5.startsWith("This sentence") &&
      got._5.contains("question mark") && got._5.contains("the quote"))
    // page flags fire on any line, kept or dropped; flag-don't-drop
    val flagged = TextOps.lineQuality(Seq(
        (2L, "Good first sentence stays in the output here.\n" +
          "var f = function() { return 1; }\n" +
          "Lorem ipsum dolor sit amet consectetur adipiscing."))
      .toDF("doc_id", "text"))
      .select($"n_lines_kept", $"has_curly", $"has_lorem")
      .as[(Long, Boolean, Boolean)].head()
    assert(flagged == ((2L, true, true)))
  }
}
