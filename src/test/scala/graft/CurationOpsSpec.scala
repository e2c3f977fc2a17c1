package graft

import org.apache.spark.sql.functions.col

/** Semantic invariants for the round-4 additions (q99-q120) — properties
  * the DuckDB oracle can't see because both engines could get them wrong
  * the same way (sketch guarantees, admission arithmetic, skew
  * identities, decile partitions). */
class CurationOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q99 label-error audit: counts consistent, suspects = minority vote") {
    val rows = run("q99_label_errors").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nNb = r.getAs[Long]("n_nb")
      val nSame = r.getAs[Long]("n_same")
      assert(nNb >= 2, "reported a vector with < 2 gated neighbors")
      assert(nSame >= 0 && nSame <= nNb)
      assert(r.getAs[Long]("suspect") == (if (nSame * 2 < nNb) 1L else 0L))
      val agree = r.getAs[Double]("agree")
      assert(agree >= 0.0 && agree <= 1.0 + 1e-9)
    }
  }

  test("q100 incremental admission partitions the batch exactly") {
    val rows = run("q100_incremental_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_batch") ==
        r.getAs[Long]("n_dup") + r.getAs[Long]("n_admitted"))
    }
    val batchTotal = graft.sources.Tables.documents(spark, sf)
      .filter(col("source") === "src0").count()
    assert(rows.map(_.getAs[Long]("n_batch")).sum == batchTotal)
  }

  test("q101 blend selection never selects more than it scores") {
    val rows = run("q101_quality_blend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sel") >= 0)
      assert(r.getAs[Long]("n_sel") <= r.getAs[Long]("n_docs"))
    }
    // z-scored composite: some but not all documents clear the mean
    val sel = rows.map(_.getAs[Long]("n_sel")).sum
    val all = rows.map(_.getAs[Long]("n_docs")).sum
    assert(sel > 0 && sel < all, s"degenerate selection $sel of $all")
  }

  test("q102 count-min estimates never undercount (one-sided error)") {
    val rows = run("q102_countmin_hitters").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"CM underestimated '${r.getAs[String]("tok")}'")
      assert(r.getAs[Long]("err") ==
        r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
  }

  test("q103 skew profile identities hold against the raw events table") {
    val rows = run("q103_key_skew").collect()
    assert(rows.nonEmpty)
    val evTotal = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == evTotal)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_rows") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Double]("skew") >= 1.0 - 1e-9)
      assert(r.getAs[Double]("top_share") <= 1.0 + 1e-9)
      assert(r.getAs[Long]("salt_n") >= 1L)
      assert(r.getAs[Long]("n_hot") <= r.getAs[Long]("n_keys"))
    }
  }

  test("q105 Zipf fit: frequencies decay (negative slope, sane intercept)") {
    val rows = run("q105_zipf_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pts") >= 2 && r.getAs[Long]("n_pts") <= 50)
      assert(r.getAs[Double]("slope") < 0.0,
        s"${r.getAs[String]("lang")} slope not negative")
      // intercept = ln(freq) at rank 1 — must dominate the tail
      assert(r.getAs[Double]("intercept") > 0.0)
    }
  }

  test("q106 correlation audit: valid Pearson range, strict upper triangle") {
    val rows = run("q106_corr_audit").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Int]("i") < r.getAs[Int]("j"))
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-6 && c <= 1.0 + 1e-6, s"corr $c out of range")
    }
  }

  test("q107 novelty totals equal the distinct-shingle count") {
    val rows = run("q107_novelty_curve").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_sh"))
      val nv = r.getAs[Double]("novelty")
      assert(nv > 0.0 && nv <= 1.0 + 1e-9)
    }
    // every distinct shingle is novel exactly once (at its first doc)
    import org.apache.spark.sql.functions.{col, explode}
    val distinctSh = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.shingleH32(col("text"), 8)).as("h"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum == distinctSh)
  }

  test("q108 containment pairs are oriented and dominate Jaccard") {
    val rows = run("q108_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_small") <= r.getAs[Long]("n_big"))
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("n_small"),
        "intersection larger than the smaller set")
      val cont = r.getAs[Double]("containment")
      assert(cont >= 0.9 - 1e-9 && cont <= 1.0 + 1e-9)
      // containment of the smaller side always >= symmetric Jaccard
      assert(cont >= r.getAs[Double]("jac") - 1e-9)
    }
  }

  test("q109 PMI pairs clear the count floor; PMI consistent with counts") {
    val rows = run("q109_pmi_collocations").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("cb") >= 20))
    // ordering: non-increasing pmi with (w1, w2) tie-break
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
  }

  test("q88 derived bucket tables equal direct corpus aggregations") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    // q88 counts the bigram-bucket explode ONCE at (bucket, is-target)
    // grain and derives the raw/target/total tables from it; rebuild the
    // three direct corpus-pass forms here and pin the equivalence.
    val bi = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), explode(TextFns.shingleH32(col("text"), 2)).as("hb"))
      .select(col("lang"), (col("hb") % 256).as("b"))
    val cnt = bi.groupBy(col("b"), (col("lang") === "en").as("is_t"))
      .agg(count(lit(1)).as("c"))
    val rawDerived = cnt.groupBy(col("b"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rawDirect = bi.groupBy(col("b")).agg(count(lit(1)).as("cr"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tgtDirect = bi.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rawDerived.nonEmpty)
    assert(rawDerived.view.mapValues(_._1).toMap == rawDirect)
    // buckets with zero target hits carry ct = 0 in the derived table and
    // are absent from the direct filtered aggregation
    rawDerived.foreach { case (b, (_, ct)) =>
      assert(ct == tgtDirect.getOrElse(b, 0L), s"bucket $b target count") }
    val (tr, tt) = (rawDerived.values.map(_._1).sum, rawDerived.values.map(_._2).sum)
    assert(tr == rawDirect.values.sum && tt == tgtDirect.values.sum)
  }

  test("q109 pair total derived from bigram counts equals token arithmetic") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    // nb = Σ cb over the unfiltered bigram count table must equal the
    // per-doc pair mass Σ max(len(toks) - 1, 0) — the closure that lets
    // q109 skip a second corpus explode just to count pairs.
    val d = graft.sources.Tables.documents(spark, sf)
      .select(TextFns.tokens(col("text")).as("toks"))
    val nbDerived = d
      .select(posexplode(slice(col("toks"), lit(1),
        greatest(size(col("toks")) - 1, lit(0)))).as(Seq("i", "w1")), col("toks"))
      .select(col("w1"), element_at(col("toks"), col("i") + 2).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .agg(sum(col("cb"))).collect()(0).getLong(0)
    val nbDirect = d
      .select(greatest(size(col("toks")) - 1, lit(0)).cast("long").as("np"))
      .agg(sum(col("np"))).collect()(0).getLong(0)
    assert(nbDerived > 0 && nbDerived == nbDirect,
      s"derived pair total $nbDerived != token-derived $nbDirect")
  }

  test("q110 logistic step: weights moved, accuracy arithmetic consistent") {
    val r = run("q110_logistic_step").collect().head
    val n = r.getAs[Long]("n_docs")
    val c = r.getAs[Long]("n_correct")
    assert(n > 0 && c >= 0 && c <= n)
    assert(math.abs(r.getAs[Double]("train_acc") - (1e-9 + c.toDouble / n)) < 1e-4)
    // three gradient steps from w=0 must move every weight off zero
    Seq("w_bias", "w_len", "w_stop", "w_awl").foreach { k =>
      val w = r.getAs[Double](k)
      assert(!w.isNaN && !w.isInfinite && w != 0.0, s"$k did not train")
    }
  }

  test("q111 sketch calibration: valid ranges, all source pairs present") {
    val rows = run("q111_minhash_drift").collect()
    val n = graft.sources.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == n * (n - 1) / 2, "missing source pairs")
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jac")
      val jac = r.getAs[Double]("jac")
      assert(est >= 0.0 && est <= 1.0 + 1e-9)
      assert(jac >= 0.0 && jac <= 1.0 + 1e-9)
      // est is quantized to 16ths of the match count
      assert(math.abs(est * 16 - math.rint(est * 16)) < 1e-4)
      assert(math.abs(r.getAs[Double]("abs_err") - math.abs(est - jac)) < 1e-4)
    }
  }

  test("q112 hubness: in-degrees positive, bounded by candidates, sorted") {
    val rows = run("q112_hubness").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      val d = r.getAs[Long]("indeg")
      // a vector can be top-1 of at most every other vector
      assert(d >= 1 && d < n)
    }
    val degs = rows.map(_.getAs[Long]("indeg"))
    assert(degs.zip(degs.tail).forall { case (a, b) => a >= b })
  }

  test("q113 effective size never exceeds raw size; totals match corpus") {
    val rows = run("q113_effective_size").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eff_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_eff_toks") <= r.getAs[Long]("n_toks"))
      val ratio = r.getAs[Double]("eff_ratio")
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-9)
    }
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // the fixture has known duplicate groups -> some source loses docs
    assert(rows.exists(r =>
      r.getAs[Long]("n_eff_docs") < r.getAs[Long]("n_docs")))
  }

  test("q114 concentration shares are ranked and sum below 1") {
    val rows = run("q114_concentration").collect()
    assert(rows.length == 10)
    val shares = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(shares.sum < 1.0)
    val counts = rows.map(_.getAs[Long]("n_events_user"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q116 curriculum deciles partition the corpus in quality order") {
    val rows = run("q116_curriculum").collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // deciles are quality-ordered and non-overlapping: each decile's max
    // quality never exceeds the next decile's min
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_q") <= b.getAs[Double]("min_q") + 1e-9,
          s"decile ${a.getAs[Long]("decile")} overlaps the next")
      case _ => ()
    }
    rows.foreach(r =>
      assert(r.getAs[Double]("min_q") <= r.getAs[Double]("max_q")))
  }

  test("q118 epoch allocation: caps, monotone by quality, budget-exact") {
    val rows = run("q118_epoch_alloc").collect()
      .sortBy(-_.getAs[Long]("decile"))
    assert(rows.length == 10)
    val epochs = rows.map(_.getAs[Double]("epochs"))
    epochs.foreach(e => assert(e >= 0.0 && e <= 4.0))
    // higher-quality tiers never get fewer epochs
    assert(epochs.zip(epochs.tail).forall { case (a, b) => a >= b - 1e-9 })
    // total allocation equals the 2x budget (up to the 4dp epoch rounding)
    val corpus = rows.map(_.getAs[Long]("token_mass")).sum.toDouble
    val allocated = rows.map(_.getAs[Double]("allocated_toks")).sum
    assert(math.abs(allocated - 2 * corpus) < corpus * 1e-3,
      s"allocated $allocated vs budget ${2 * corpus}")
  }

  test("q119 LSH recall audit: flags binary, p monotone in similarity") {
    val rows = run("q119_lsh_recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("caught")
      assert(c == 0L || c == 1L)
      val p = r.getAs[Double]("p_detect")
      assert(p > 0.0 && p <= 1.0 + 1e-9)
      assert(r.getAs[Double]("jac") >= 0.6 - 1e-9)
    }
    // detection probability is monotone in the similarity
    val byJac = rows.sortBy(_.getAs[Double]("jac"))
      .map(_.getAs[Double]("p_detect"))
    assert(byJac.zip(byJac.tail).forall { case (a, b) => a <= b + 1e-9 })
    // at jac >= 0.6 with (4,4) bands the analytic floor is ~41%; the
    // fixture's pairs are nearly exact, so empirical recall should be high
    assert(rows.count(_.getAs[Long]("caught") == 1L) * 2 > rows.length)
  }

  test("q104 every reported group spans more than one language") {
    val rows = run("q104_crosslang_dup").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_langs") >= 2)
      assert(r.getAs[Long]("n_docs") >= r.getAs[Long]("n_langs"))
      assert(r.getAs[String]("langs").split(",").length ==
        r.getAs[Long]("n_langs"))
    }
  }

  test("q120 cap audit: shares and fan-outs internally consistent") {
    val r = run("q120_cap_audit").collect().head
    assert(r.getAs[Long]("n_hot") <= r.getAs[Long]("n_shingles"))
    assert(r.getAs[Long]("postings_hot") <= r.getAs[Long]("postings"))
    assert(r.getAs[Long]("max_df_kept") <= r.getAs[Long]("max_df"))
    assert(r.getAs[Long]("worst_fanout_capped") <=
      r.getAs[Long]("worst_fanout_uncapped"))
    val share = r.getAs[Double]("hot_share")
    assert(share >= 0.0 && share <= 1.0 + 1e-9)
    // the audited threshold must agree with q29's actual cap arithmetic
    val ndocs = graft.sources.Tables.documents(spark, sf).count()
    if (r.getAs[Long]("n_hot") == 0)
      assert(r.getAs[Long]("max_df") * 100 <= math.max(2500L, ndocs))
  }

  test("q133 hygiene counts equal the deterministic injection schedule") {
    val rows = run("q133_encoding_hygiene").collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    // the audit must find exactly what the doc_id schedule injected
    assert(rows.map(_.getAs[Long]("docs_ctrl")).sum ==
      docs.count(_ % 7 == 0))
    assert(rows.map(_.getAs[Long]("docs_zw")).sum ==
      docs.count(_ % 5 == 0))
    assert(rows.map(_.getAs[Long]("repl_chars")).sum ==
      docs.count(_ % 11 == 0))
    rows.foreach { r =>
      assert(r.getAs[Long]("clean_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q136 normalization counts equal the deterministic injection schedule") {
    val rows = run("q136_unicode_nfc").collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    // a doc changes under NFC iff it got a decomposed injection
    assert(rows.map(_.getAs[Long]("docs_denorm")).sum ==
      docs.count(d => d % 3 == 0 || d % 7 == 0))
    // each combining mark composes away exactly one codepoint:
    // %3 injects one (acute), %7 injects two (ring + diaeresis)
    assert(rows.map(_.getAs[Long]("cp_saved")).sum ==
      docs.count(_ % 3 == 0) + 2L * docs.count(_ % 7 == 0))
  }

  test("q134 k-center: distinct exemplars, non-increasing coverage radius") {
    val rows = run("q134_kcenter_coreset").collect()
    assert(rows.length == 8)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length, "an exemplar was re-selected")
    val minId = graft.sources.Tables.embeddings(spark, sf)
      .agg(org.apache.spark.sql.functions.min(col("vec_id")))
      .collect().head.getLong(0)
    assert(rows.head.getAs[Int]("sel_order") == 0 && ids.head == minId)
    // farthest-point selection: each pick covers at least as much as the
    // next (min-distances only shrink as centers are added)
    val radii = rows.drop(1).map(_.getAs[Double]("radius2"))
    radii.sliding(2).foreach { w =>
      assert(w(0) >= w(1) - 1e-9, s"radius increased: ${w(0)} -> ${w(1)}")
    }
    assert(radii.forall(_ > 0.0))
  }

  test("q138 funnel stages shrink monotonically and sum to the corpus") {
    val rows = run("q138_curation_funnel").collect()
    val bySource = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("source")).toSet == bySource.keySet)
    rows.foreach { r =>
      val (raw, exact, canon) = (r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_exact_unique"), r.getAs[Long]("n_canonical"))
      assert(raw == bySource(r.getAs[String]("source")))
      // exact dups share a blocking key, so they collapse into one
      // cluster: canonical survivors can never exceed exact-unique keys
      assert(canon <= exact && exact <= raw,
        s"${r.getAs[String]("source")}: funnel not monotone ($raw -> $exact -> $canon)")
      val ret = r.getAs[Double]("retained")
      assert(ret > 0.0 && ret <= 1.0)
    }
  }

  test("q135 folds are leakage-free: no duplicate cluster spans folds") {
    import org.apache.spark.sql.functions._
    val rows = run("q135_leakage_safe_folds").collect()
    assert(rows.length == 5)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // every q59 cluster must land wholly inside one fold — the property
    // that makes the split safe for held-out evaluation
    val labels = graft.queries.Dedup.dupLabels(spark, sf)
    val spanning = labels
      .withColumn("fold",
        graft.functions.TextFns.h32(concat(lit("fold_"), col("comp"))) % 5)
      .groupBy(col("comp")).agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1).count()
    assert(spanning == 0, s"$spanning clusters span folds")
  }

  test("q140 calibration audit: bins partition the corpus, ECE terms consistent") {
    val rows = run("q140_calibration_audit").collect()
    assert(rows.nonEmpty)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "bins must partition every document exactly once")
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      assert(bin >= 0 && bin <= 9)
      val meanP = r.getAs[Double]("mean_p")
      // mean predicted probability lives inside its own bin (cap bin 9
      // absorbs p = 1.0)
      assert(meanP >= bin / 10.0 - 1e-6 &&
        meanP <= (if (bin == 9) 1.0 else (bin + 1) / 10.0) + 1e-6,
        s"bin $bin mean_p $meanP outside its bounds")
      val fracPos = r.getAs[Double]("frac_pos")
      assert(fracPos >= 0.0 && fracPos <= 1.0 + 1e-9)
      assert(math.abs(r.getAs[Double]("gap") - (meanP - fracPos)) < 2e-5)
      val ece = r.getAs[Double]("ece_part")
      assert(math.abs(ece -
        math.abs(r.getAs[Double]("gap")) * r.getAs[Long]("n_docs") / nDocs) < 2e-6)
    }
  }
}
