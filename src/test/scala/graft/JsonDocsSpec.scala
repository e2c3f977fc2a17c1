package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.JsonDocs

class JsonDocsSpec extends SparkSpec {

  private def stage(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"), lines.mkString("\n"))
    dir.toString
  }

  test("every input line lands in exactly one of clean/quarantine") {
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10}""",
      """{"doc_id": 2, "text": "gamma", "lang": "en", "source": "web"}""", // n_chars derived
      """{"doc_id": 3, "text": "delta"}""",                // lang/source defaulted
      """{"doc_id": 4 "text": "broken json"""",            // unparseable
      """not json at all""",                               // unparseable
      """{"doc_id": null, "text": "orphan"}""",            // missing_id
      """{"doc_id": -7, "text": "negative"}""",            // negative_id
      """{"doc_id": 9}""",                                 // missing_text
      "",                                                  // blank separator
      "   "                                                // whitespace-only
    )
    val path = stage(lines)
    val parsed = JsonDocs.parse(spark, path)
    try {
      val clean = JsonDocs.clean(parsed).collect()
      val quar = JsonDocs.quarantine(parsed).collect()
      // Spark's JSON source silently skips whitespace-only lines — the
      // audit's blank bucket accounts for them below
      assert(clean.length + quar.length == lines.length - 2,
        s"${clean.length} clean + ${quar.length} quarantined != non-blank lines")
      assert(clean.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 3L))
      // defaults and derivations
      val byId = clean.map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(byId(2L).getAs[Long]("n_chars") == 5L)
      assert(byId(3L).getAs[String]("lang") == "und")
      assert(byId(3L).getAs[String]("source") == "unknown")
      // quarantine reasons
      val reasons = quar.map(_.getAs[String]("reason")).groupBy(identity)
        .view.mapValues(_.length).toMap
      assert(reasons == Map("unparseable" -> 2, "missing_id" -> 1,
        "negative_id" -> 1, "missing_text" -> 1), s"got $reasons")
      // raw lines survive verbatim for the unparseable bucket
      val raw = quar.filter(_.getAs[String]("reason") == "unparseable")
        .map(_.getAs[String]("raw")).toSet
      assert(raw.contains("not json at all"))
      // the funnel audit closes over the PHYSICAL line count, blanks
      // included
      val audit = JsonDocs.audit(spark, path, parsed).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(audit.values.sum == lines.length)
      assert(audit("clean") == 3L)
      assert(audit("blank") == 2L)
    } finally { parsed.unpersist(); () }
  }

  test("a top-level-array line quarantines whole — the closure never multiplies rows") {
    // the JSON file source would explode this batched-dump line into 2
    // clean rows for 1 physical line, silently breaking the funnel's
    // one-line-one-row closure; the from_json path rejects it as a
    // contract violation (JSONL = one document per line)
    val lines = Seq(
      """{"doc_id": 1, "text": "solo"}""",
      """[{"doc_id": 2, "text": "a"}, {"doc_id": 3, "text": "b"}]""")
    val path = stage(lines)
    val parsed = JsonDocs.parse(spark, path)
    try {
      assert(JsonDocs.clean(parsed).count() == 1L)
      val quar = JsonDocs.quarantine(parsed).collect()
      assert(quar.length == 1 &&
        quar.head.getAs[String]("reason") == "unparseable")
      val audit = JsonDocs.audit(spark, path, parsed).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(audit.values.sum == lines.length, s"funnel did not close: $audit")
    } finally { parsed.unpersist(); () }
  }

  test("closure property: 300 seeded random lines of mixed garbage all land exactly once") {
    // the funnel's whole contract is "every physical line accounted
    // exactly once, whatever the line is" — so feed it a seeded mix of
    // every malformation class at once and assert the accounting, not
    // just the per-class behavior the targeted tests above pin
    val rnd = new scala.util.Random(42)
    val expectClean = scala.collection.mutable.Set.empty[Long]
    val lines = (0 until 300).map { i =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // valid doc (some with optional fields)
          expectClean += i.toLong
          val extra = if (rnd.nextBoolean()) s""", "lang": "l${rnd.nextInt(3)}"""" else ""
          s"""{"doc_id": $i, "text": "w${rnd.nextInt(100)} w${rnd.nextInt(100)}"$extra}"""
        case 4 => // broken JSON: truncated prefix of a valid line
          val full = s"""{"doc_id": $i, "text": "t"}"""
          full.take(3 + rnd.nextInt(full.length - 3))
        case 5 => // top-level array (batched dump)
          s"""[{"doc_id": $i, "text": "a"}, {"doc_id": ${i + 1000}, "text": "b"}]"""
        case 6 => // scalar / junk line
          Seq(s"$i", "\"bare string\"", "true", "nøt jsøn", "}{")(rnd.nextInt(5))
        case 7 => // contract violations inside valid JSON
          Seq(s"""{"doc_id": null, "text": "x"}""",
            s"""{"doc_id": ${-i - 1}, "text": "x"}""",
            s"""{"doc_id": $i}""")(rnd.nextInt(3))
        case 8 => // blank / whitespace
          Seq("", "   ", "\t")(rnd.nextInt(3))
        case 9 => // valid doc with pre-set n_chars
          expectClean += i.toLong
          s"""{"doc_id": $i, "text": "abc", "n_chars": 3}"""
      }
    }
    val path = stage(lines)
    val parsed = JsonDocs.parse(spark, path)
    try {
      val clean = JsonDocs.clean(parsed)
      val quar = JsonDocs.quarantine(parsed)
      val nBlank = lines.count(_.trim.isEmpty)
      assert(clean.count() + quar.count() == (lines.length - nBlank).toLong,
        "clean + quarantine != non-blank physical lines")
      assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        expectClean.toSeq.sorted, "clean ids differ from the generated valid set")
      val audit = JsonDocs.audit(spark, path, parsed).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(audit.values.sum == lines.length,
        s"funnel did not close over the physical line count: $audit")
      assert(audit("blank") == nBlank.toLong)
    } finally { parsed.unpersist(); () }
  }

  test("clean output drops into the documents-table query surface") {
    val lines = (0 until 30).map(i =>
      s"""{"doc_id": $i, "text": "the quick data value item $i of corpus", "lang": "en", "source": "s${i % 3}"}""")
    val parsed = JsonDocs.parse(spark, stage(lines))
    try {
      val clean = JsonDocs.clean(parsed)
      assert(clean.schema.fieldNames.toSeq ==
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      assert(clean.count() == 30)
      // a representative downstream op runs unchanged on the ingested frame
      val banded = graft.queries.Dedup.bandTableOf(clean)
      assert(banded.count() == 4L * 30)
    } finally { parsed.unpersist(); () }
  }
}
