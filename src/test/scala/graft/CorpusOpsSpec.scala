package graft

/** Semantic invariants for the round-4 pack (q89-q95) — properties the
  * DuckDB oracle can't see because both engines could get them wrong the
  * same way (graph identities, Bloom guarantees, entropy bounds). */
class CorpusOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q89 triangle participation sums to a multiple of 3") {
    val rows = run("q89_triangle_count").collect()
    assert(rows.nonEmpty)
    // each triangle contributes exactly one count to each of its 3 corners
    val tot = rows.map(_.getAs[Long]("n_tri")).sum
    assert(tot % 3 == 0, s"total participation $tot not a multiple of 3")
    // degree is bounded by the number of other nodes
    rows.foreach(r => assert(r.getAs[Long]("degree") <= rows.length - 1))
  }

  test("q90 retention is 1.0 at offset 0 and never exceeds cohort size") {
    val rows = run("q90_retention_cohorts").collect()
    val base = rows.filter(_.getAs[Long]("offset_wk") == 0L)
    assert(base.nonEmpty, "no offset-0 cohort rows")
    base.foreach(r =>
      assert(math.abs(r.getAs[Double]("retention") - 1.0) < 1e-6))
    rows.foreach { r =>
      assert(r.getAs[Long]("offset_wk") >= 0L)
      assert(r.getAs[Double]("retention") <= 1.0 + 1e-9)
    }
  }

  test("q91 every reported outlier day is >= 2 sigma above its user mean") {
    val rows = run("q91_outlier_days").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("z") >= 2.0,
      s"z=${r.getAs[Double]("z")} below the 2-sigma cut"))
  }

  test("q92 chunk geometry is consistent (count, stride, padding)") {
    val rows = run("q92_context_chunks").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_toks")
      val c = r.getAs[Long]("n_chunks")
      val pad = r.getAs[Long]("pad")
      assert(c == (n - 1) / 24 + 1, s"n_chunks $c wrong for $n tokens")
      assert(pad == math.max(0L, 32L - (n - 24L * (c - 1))),
        s"pad $pad wrong for $n tokens / $c chunks")
    }
  }

  test("q93 prefix pairs are strict (prefix shorter) and text-verified") {
    val d = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = run("q93_prefix_dup").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("prefix_toks") < r.getAs[Long]("full_toks"))
      val a = d(r.getAs[Long]("prefix_doc"))
      val b = d(r.getAs[Long]("full_doc"))
      assert(b.startsWith(a + " "), "reported pair is not a token-boundary prefix")
    }
  }

  test("q94 entropy is within [0, ln(n_uniq)] and evenness within [0, 1]") {
    run("q94_token_entropy").collect().foreach { r =>
      // 1e-5 epsilon: values are rounded to 5 dp, so a uniform document
      // can land half an ulp-of-rounding above the exact ln(n_uniq)
      val h = r.getAs[Double]("entropy")
      val bound = math.log(r.getAs[Long]("n_uniq").toDouble)
      assert(h >= -1e-5 && h <= bound + 1e-5,
        s"entropy $h outside [0, $bound]")
      val e = r.getAs[Double]("evenness")
      assert(e >= -1e-5 && e <= 1.0 + 1e-5)
    }
  }

  test("q96 sorted neighborhood finds every exact-dup adjacency at jac 1.0") {
    val pairs = run("q96_sorted_neighborhood").collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getAs[Double]("jac") >= 0.8))
    // q28's content key IS q96's sort key (bag-of-words normal form), so
    // each exact-dup group of size g sorts contiguously and contributes
    // at least g-1 unit-Jaccard neighbor pairs
    val expected = run("q28_exact_dedup").collect()
      .map(_.getAs[Long]("n_docs") - 1).sum
    val unit = pairs.count(_.getAs[Double]("jac") >= 1.0 - 1e-9)
    assert(unit >= expected,
      s"$unit unit-Jaccard pairs < $expected exact-dup adjacencies")
  }

  test("q97 winsorized mean never exceeds the raw mean, clipping bounded") {
    val rows = run("q97_winsorized_stats").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_wins") <= r.getAs[Double]("mean_raw") + 1e-9)
      // at most ~10% of a source sits strictly above its own p90
      assert(r.getAs[Long]("n_clipped") <=
        math.ceil(0.1 * r.getAs[Long]("n_docs")).toLong)
    }
  }

  test("q98 overlap matrix covers all source pairs with valid Jaccards") {
    val rows = run("q98_source_overlap").collect()
    assert(rows.length == 20 * 19 / 2)
    rows.foreach { r =>
      val inter = r.getAs[Long]("inter")
      assert(inter <= math.min(r.getAs[Long]("na"), r.getAs[Long]("nb")))
      val j = r.getAs[Double]("jac")
      assert(j >= 0.0 && j <= 1.0 + 1e-9)
    }
  }

  test("q137 paragraph dedup: arithmetic closes, one keeper per distinct paragraph") {
    val rows = run("q137_paragraph_dedup").collect()
    assert(rows.length == 20, s"expected 20 sources, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ==
        r.getAs[Long]("n_paras"))
      val pct = r.getAs[Double]("removed_pct")
      assert(pct >= 0.0 && pct <= 1.0 + 1e-9)
    }
    // exactly one instance of every distinct paragraph survives globally
    val inst = graft.queries.Dedup.paraInstances(spark, sf)
    val distinctPh = inst.select("ph").distinct().count()
    assert(rows.map(_.getAs[Long]("n_kept")).sum == distinctPh,
      "kept-instance total must equal the distinct-paragraph count")
  }

  test("q137 paragraph grain agrees with q76's CDC chunk geometry") {
    // same boundary rule: paragraph count per doc equals q76's n_chunks,
    // minus one exactly when the document's final token is itself a
    // boundary (q137 merges the empty trailing segment; q76 counts it)
    val perDoc = graft.queries.Dedup.paraInstances(spark, sf)
      .groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    val chunks = run("q76_cdc_chunking").collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nc = r.getAs[Long]("n_chunks")
      val np = perDoc.getOrElse(id, 0L)
      assert(np == nc || np == nc - 1,
        s"doc $id: $np paragraphs vs $nc CDC chunks")
    }
  }

  test("q95 Bloom filter: no false negatives, bounded false-positive leakage") {
    val rows = run("q95_bloom_prune").collect()
    val urgent = rows.find(_.getAs[String]("o_orderpriority") == "1-URGENT").get
    // the Bloom guarantee: every member key passes
    assert(urgent.getAs[Long]("n_pass") == urgent.getAs[Long]("n_orders"))
    val rest = rows.filter(_.getAs[String]("o_orderpriority") != "1-URGENT")
    val fp = rest.map(_.getAs[Long]("n_pass")).sum.toDouble /
      rest.map(_.getAs[Long]("n_orders")).sum
    // 2^20 bits / 3 probes vs ~300 keys at sf0.001: FP rate ~1e-9
    assert(fp < 0.01, s"false-positive leakage $fp")
  }
}
