package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The operator library driven from PURE SQL: GraftExtensions registers
  * table functions (and the native scalar expressions) into the session,
  * so a SQL-only client gets the same operators — the engine-native analog
  * of the reference's properties-file queries. Each case runs an operator
  * via spark.sql ONLY and checks equality with the Column-API path.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: scala.collection.Seq[_] => a.toList
      case x => x
    }).toSet

  private lazy val docsView: Unit = {
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    Seq(
      (1L, a),
      (2L, a + " tail tweak"),                            // near-dup of 1
      (3L, (1 to 12).map(i => s"a$i").mkString(" ")),     // contained in 1
      (4L, (100 to 140).map(i => s"z$i").mkString(" ")))  // unrelated
      .toDF("doc_id", "text").createOrReplaceTempView("sql_docs")
  }

  test("graft_near_dup_pairs runs the LSH dedup from SQL") {
    docsView
    val viaSql = spark.sql("SELECT * FROM graft_near_dup_pairs('sql_docs')")
    val direct = graft.text.Dedup.nearDupPairs(spark.table("sql_docs"))
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    assert(rows(viaSql).exists(_.take(2) == Seq(1L, 2L)),
      "the planted near-dup pair must surface through SQL")
  }

  test("graft_containment_exact runs the prefix-filtered containment join from SQL") {
    docsView
    val viaSql = spark.sql(
      "SELECT * FROM graft_containment_exact('sql_docs') WHERE inter_size = min_size")
    assert(rows(viaSql).exists(_.take(2) == Seq(1L, 3L)),
      "the planted quoted-inside-larger pair must surface through SQL")
  }

  test("graft_profile runs the one-pass profile from SQL and composes with outer SQL") {
    docsView
    val viaSql = spark.sql(
      "SELECT column_name, n_rows, n_distinct FROM graft_profile('sql_docs', " +
        "'doc_id, text') ORDER BY column_name")
      .as[(String, Long, Long)].collect().toSeq
    assert(viaSql === Seq(("doc_id", 4L, 4L), ("text", 4L, 4L)))
  }

  test("graft_pack_greedy packs from SQL, identical to the Column API") {
    spark.range(1, 101)
      .select(col("id").as("doc_id"), (col("id") % 7 + 1).as("n_tokens"))
      .createOrReplaceTempView("sql_tok")
    val viaSql = spark.sql(
      "SELECT * FROM graft_pack_greedy('sql_tok', 'doc_id', 'n_tokens', 16, 4)")
    val direct = graft.operators.Packing.greedyPack(
      spark.table("sql_tok"), "doc_id", "n_tokens", maxTokens = 16, shards = 4)
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
  }

  test("graft_repeated_spans and graft_span_scrub run the span family from SQL") {
    docsView
    val spansSql = spark.sql("SELECT * FROM graft_repeated_spans('sql_docs')")
    val spansDirect = graft.text.Queries.repeatedSpans(spark.table("sql_docs"))
    assert(spansSql.columns === spansDirect.columns)
    assert(rows(spansSql) === rows(spansDirect))
    assert(spansSql.count() > 0, "the planted near-dup pair must flag spans")
    val scrubSql = spark.sql("SELECT * FROM graft_span_scrub('sql_docs')")
    val scrubDirect = graft.text.Queries.scrubRepeatedSpans(spark.table("sql_docs"))
    assert(scrubSql.columns === scrubDirect.columns)
    assert(rows(scrubSql) === rows(scrubDirect))
  }

  test("graft_sliding_chunks chunks from SQL, identical to the Column API") {
    spark.table("sql_docs")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .createOrReplaceTempView("sql_toks")
    val viaSql = spark.sql(
      "SELECT * FROM graft_sliding_chunks('sql_toks', 'doc_id', 'ws', 8, 6)")
    val direct = graft.operators.Packing.slidingChunks(
      spark.table("sql_toks"), "doc_id", "ws", size = 8, stride = 6)
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    assert(viaSql.count() > 0)
  }

  test("graft_lm_score scores from SQL, identical to the Column API") {
    docsView
    Seq((100L, "a1 a2 a3 a4 a5 a6 a7 a8"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_trusted")
    val viaSql = spark.sql(
      "SELECT * FROM graft_lm_score('sql_trusted', 'sql_docs')")
    val direct = graft.text.Lm.scoreAgainst(
      spark.table("sql_trusted"), spark.table("sql_docs"))
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    // composes with outer SQL: the gate is one WHERE away
    val kept = spark.sql("SELECT doc_id FROM graft_lm_score('sql_trusted', 'sql_docs') " +
      "WHERE score_ppm >= 1000").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(4L))
  }

  test("graft_lm_score_store and graft_profile_serve serve persisted stores from SQL") {
    docsView
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlstores")
    graft.text.LmStore.build(
      Seq((100L, "a1 a2 a3 a4 a5 a6 a7 a8")).toDF("doc_id", "text"),
      s"$dir/lm", "d0")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_lm_score_store('$dir/lm', 'sql_docs')")
    val direct = graft.text.LmStore.scoreVsStore(spark.table("sql_docs"), s"$dir/lm")
    assert(rows(viaSql) === rows(direct))

    graft.operators.ProfileStore.build(
      spark.table("sql_docs"), Seq("doc_id", "text"), s"$dir/prof", "d0")
    val served = spark.sql(s"SELECT * FROM graft_profile_serve('$dir/prof') " +
      "WHERE column_name = 'doc_id'")
    assert(served.select("n_rows").as[Long].head() === 4L)
  }

  test("graft_heavy_hitters and graft_split_leakage run from SQL, identical to the Column API") {
    docsView
    val hh = spark.sql(
      "SELECT * FROM graft_heavy_hitters('sql_docs', 'doc_id', 4)")
    val hhDirect = graft.operators.Scale.heavyHitters(
      spark.table("sql_docs"), "doc_id", k = 4)
    assert(rows(hh) === rows(hhDirect))
    assert(rows(hh).size === 4, "4 distinct ids over 4 rows: all qualify at k=4")

    val lk = spark.sql("SELECT * FROM graft_split_leakage('sql_docs', 500)")
    val lkDirect = graft.text.Dedup.crossSplitLeakage(
      spark.table("sql_docs"), cuts = Seq("train" -> 500, "eval" -> 1000))
    assert(lk.columns === lkDirect.columns)
    assert(rows(lk) === rows(lkDirect))
  }

  test("graft_novelty_store scores novelty vs a persisted gram store from SQL") {
    docsView
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlgrams")
    // seed id 0 < every sql_docs id: history owns the shared grams
    // (ownership is min doc_id over history ∪ drop — q126's rule)
    graft.text.GramStore.build(
      Seq((0L, (1 to 30).map(i => s"a$i").mkString(" ")))
        .toDF("doc_id", "text"), s"$dir/grams", "d0")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_novelty_store('$dir/grams', 'sql_docs')")
    val direct = graft.text.GramStore.noveltyOfDrop(
      spark.table("sql_docs"), s"$dir/grams")
    assert(rows(viaSql) === rows(direct))
    // doc 1 repeats the stored doc verbatim: zero novel grams through SQL
    assert(rows(viaSql).exists(r => r.head == 1L && r(2) == 0L))
  }

  test("graft_span_detect_store / graft_span_scrub_store serve the span store from SQL") {
    docsView
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlspans")
    // seed id 0 < every sql_docs id: history owns the keepers
    graft.text.SpanStore.build(
      Seq((0L, (1 to 30).map(i => s"a$i").mkString(" ")))
        .toDF("doc_id", "text"), s"$dir/spans", "d0")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_span_detect_store('$dir/spans', 'sql_docs')")
    val direct = graft.text.SpanStore.detectVsDrop(
      spark.table("sql_docs"), s"$dir/spans")
    assert(rows(viaSql) === rows(direct))
    // doc 1 repeats the stored doc verbatim: one full-width span via SQL
    assert(rows(viaSql).exists(r => r.head == 1L && r(1) == 1))
    val scrubSql = spark.sql(
      s"SELECT * FROM graft_span_scrub_store('$dir/spans', 'sql_docs')")
    val scrubDirect = graft.text.SpanStore.scrubVsDrop(
      spark.table("sql_docs"), s"$dir/spans")
    assert(rows(scrubSql) === rows(scrubDirect))
    // the verbatim repeat scrubs to empty; the unrelated doc is untouched
    assert(rows(scrubSql).exists(r => r.head == 1L && r(3) == ""))
    assert(rows(scrubSql).exists(r => r.head == 4L && r(2) == 0L))
  }

  test("graft_cdc_chunks / graft_chunk_census_store run CDC dedup from SQL") {
    docsView
    val viaSql = spark.sql("SELECT * FROM graft_cdc_chunks('sql_docs')")
    val direct = graft.text.Dedup.cdcChunks(spark.table("sql_docs"))
    assert(rows(viaSql) === rows(direct))
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlchunks")
    graft.text.ChunkStore.build(
      Seq((0L, (1 to 30).map(i => s"a$i").mkString(" ")))
        .toDF("doc_id", "text"), s"$dir/chunks", "d0")
    val census = spark.sql(
      s"SELECT * FROM graft_chunk_census_store('$dir/chunks', 'sql_docs')")
    val censusDirect = graft.text.ChunkStore.dupStatsVsDrop(
      spark.table("sql_docs"), s"$dir/chunks")
    assert(rows(census) === rows(censusDirect))
    // doc 1 repeats the stored doc verbatim: all chunks shared via SQL
    assert(rows(census).exists(r => r.head == 1L && r(1) == r(3)))
  }

  test("graft_bm25 / graft_bm25_store run retrieval from SQL") {
    docsView
    Seq((100L, "a1"), (100L, "a2"))
      .toDF("query_id", "term").createOrReplaceTempView("sql_queries")
    val viaSql = spark.sql(
      "SELECT * FROM graft_bm25('sql_docs', 'sql_queries', 3)")
    val direct = graft.text.Retrieval.bm25TopK(
      graft.text.Retrieval.postings(spark.table("sql_docs")),
      spark.table("sql_queries"), k = 3)
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    // the containment doc (3) packs a1/a2 densest (dl 12 vs 30) — rank 1
    assert(rows(viaSql).nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlbm25")
    graft.text.PostingsStore.build(
      spark.table("sql_docs"), s"$dir/post", "d0")
    Seq((200L, "z100")).toDF("doc_id", "text")
      .createOrReplaceTempView("sql_drop")
    val served = spark.sql(
      s"SELECT * FROM graft_bm25_store('$dir/post', 'sql_drop', 'sql_queries', 3)")
    val servedDirect = graft.text.PostingsStore.bm25ForQueriesVsDrop(
      spark.table("sql_drop"), s"$dir/post",
      spark.table("sql_queries"), k = 3)
    assert(rows(served) === rows(servedDirect))
    // the drop doc shares no query term — it can never be a candidate
    assert(!rows(served).exists(_(1) == 200L))
    assert(rows(served).map(_.head).toSet === Set(100L))
    // a duplicate (query_id, term) row in the user-supplied workload must
    // count ONCE, not double the term's contribution (the TVF face takes
    // an arbitrary table — bm25TopK dedups the workload)
    Seq((100L, "a1"), (100L, "a1"), (100L, "a2"))
      .toDF("query_id", "term").createOrReplaceTempView("sql_queries_dup")
    val dup = spark.sql(
      "SELECT * FROM graft_bm25('sql_docs', 'sql_queries_dup', 3)")
    assert(rows(dup) === rows(viaSql))
    // the MaxScore-pruned TVF is exact at every cutoff — 0 forces the
    // fallback branch, a huge cutoff makes everything essential
    for (cutoff <- Seq(0, 1000000))
      assert(rows(spark.sql(
        s"SELECT * FROM graft_bm25_maxscore('sql_docs', 'sql_queries', 3, $cutoff)"))
        === rows(viaSql), s"cutoff $cutoff")
  }

  test("graft_classify_store classifies against a persisted count store from SQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlclassify")
    graft.text.ClassifyStore.build(
      Seq((1L, "aa", "alpha alpha beta shared"),
          (2L, "bb", "omega psi psi shared"))
        .toDF("doc_id", "lang", "text"), s"$dir/cls", "d0")
    Seq((10L, "aa", "alpha beta shared"), (11L, "bb", "omega psi shared"))
      .toDF("doc_id", "lang", "text").createOrReplaceTempView("sql_probe")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_classify_store('$dir/cls', 'sql_probe')")
    val direct = graft.text.ClassifyStore.predictVsStore(
      spark.table("sql_probe"), s"$dir/cls")
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    // the planted signal separates: each probe lands in its own class
    assert(rows(viaSql).map(r => r.head -> r(2)).toSet ===
      Set(10L -> "aa", 11L -> "bb"))
  }

  test("graft_dsir_score / graft_dsir_store run importance scoring from SQL") {
    Seq((100L, "alpha beta alpha"), (101L, "beta alpha"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_target")
    Seq((1L, "alpha noise"), (2L, "junk junk filler"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_raw")
    val viaSql = spark.sql(
      "SELECT * FROM graft_dsir_score('sql_target', 'sql_raw')")
    val direct = graft.text.Dsir.score(
      spark.table("sql_target"), spark.table("sql_raw"))
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    // the target-like raw doc out-scores the junk one
    val byDoc = rows(viaSql).map(r => r.head -> r(2).asInstanceOf[Long]).toMap
    assert(byDoc(1L) > byDoc(2L))
    val dir = java.nio.file.Files.createTempDirectory("graft-sqldsir")
    graft.text.DsirStore.build(
      spark.table("sql_raw"), s"$dir/dsir", "d0")
    Seq((10L, "alpha beta"), (11L, "junk noise"))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_dsir_drop")
    val served = spark.sql(
      s"SELECT * FROM graft_dsir_store('$dir/dsir', 'sql_target', 'sql_dsir_drop')")
    val servedDirect = graft.text.DsirStore.scoreVsDrop(
      spark.table("sql_target"), spark.table("sql_dsir_drop"), s"$dir/dsir")
    assert(rows(served) === rows(servedDirect))
    // the store face ≡ from-scratch on history ∪ drop, restricted to the drop
    val scratch = graft.text.Dsir.score(spark.table("sql_target"),
      spark.table("sql_raw").unionByName(spark.table("sql_dsir_drop")))
      .filter(col("doc_id") >= 10L)
    assert(rows(served) === rows(scratch))
  }

  test("graft_sketch_store / graft_sketch_growth read the distinct sketch from SQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlsketch")
    val a = Seq((1L, "one two three four five six"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    graft.text.SketchStore.build(a, s"$dir/sk", "a")
    graft.text.SketchStore.append(b, s"$dir/sk", "b")
    val est = spark.sql(s"SELECT * FROM graft_sketch_store('$dir/sk')")
    val estDirect = graft.text.SketchStore.serveEstimate(spark, s"$dir/sk")
    assert(est.columns === estDirect.columns)
    assert(rows(est) === rows(estDirect))
    val curve = spark.sql(
      s"SELECT * FROM graft_sketch_growth('$dir/sk') ORDER BY drops_seen")
    val curveDirect = graft.text.SketchStore.growthCurve(spark, s"$dir/sk")
      .orderBy(col("drops_seen"))
    assert(curve.columns === curveDirect.columns)
    assert(rows(curve) === rows(curveDirect))
    // the last prefix's estimate is the full-store estimate
    assert(rows(curve).last.last === rows(est).head.last)
    val ov = spark.sql(
      s"SELECT * FROM graft_sketch_overlap('$dir/sk')")
    val ovDirect = graft.text.SketchStore.overlapMatrix(spark, s"$dir/sk")
    assert(ov.columns === ovDirect.columns)
    assert(rows(ov) === rows(ovDirect))
    b.createOrReplaceTempView("sql_sketch_cand")
    val adm = spark.sql(
      s"SELECT * FROM graft_sketch_admit('$dir/sk', 'sql_sketch_cand')")
    val admDirect = graft.text.SketchStore.admission(b, s"$dir/sk")
    assert(adm.columns === admDirect.columns)
    assert(rows(adm) === rows(admDirect))
    // b is already ingested: the candidate must read fully contained
    assert(adm.select("containment_ppm").as[Long].head() === 1000000L)
  }

  test("graft_cms_store / graft_cms_estimate read the frequency sketch from SQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlcms")
    val a = Seq((1L, "one two three four five six"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    graft.text.FreqStore.build(a, s"$dir/cms", "a")
    graft.text.FreqStore.append(b, s"$dir/cms", "b")
    val cnt = spark.sql(s"SELECT * FROM graft_cms_store('$dir/cms')")
    val cntDirect = graft.text.FreqStore.serveCounters(spark, s"$dir/cms")
    assert(cnt.columns === cntDirect.columns)
    assert(rows(cnt) === rows(cntDirect))
    Seq("one two three", "never seen xq").toDF("term")
      .createOrReplaceTempView("sql_cms_probes")
    val est = spark.sql(
      s"SELECT * FROM graft_cms_estimate('$dir/cms', 'sql_cms_probes')")
    val estDirect = graft.text.FreqStore.serveEstimates(spark,
      spark.table("sql_cms_probes"), s"$dir/cms")
    assert(est.columns === estDirect.columns)
    assert(rows(est) === rows(estDirect))
    // the ingested gram estimates >= 1 (one-sided guarantee); both
    // probes answered from drops x 4096 stored rows, no corpus scan
    val byTerm = est.as[(String, Long)].collect().toMap
    assert(byTerm("one two three") >= 1L)
    assert(byTerm("never seen xq") >= 0L)
  }

  test("graft_sample_store / graft_sample_audit read the standing sample from SQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlsample")
    val a = (1L to 50L).map(i => (i, (s"w$i " * 3).trim, "en"))
      .toDF("doc_id", "text", "lang")
    val b = (51L to 120L).map(i => (i, (s"w$i " * 3).trim, "de"))
      .toDF("doc_id", "text", "lang")
    graft.text.SampleStore.build(a, s"$dir/kmv", "a", k = 16)
    graft.text.SampleStore.append(b, s"$dir/kmv", "b")
    val sm = spark.sql(s"SELECT * FROM graft_sample_store('$dir/kmv')")
    val smDirect = graft.text.SampleStore.serveSample(spark, s"$dir/kmv")
    assert(sm.columns === smDirect.columns)
    assert(rows(sm) === rows(smDirect))
    // and the serve == from-scratch law holds through the SQL face
    val scratch = graft.text.KmvSample.sample(a.unionByName(b), 16)
    assert(rows(sm) === rows(scratch))
    a.unionByName(b).createOrReplaceTempView("sql_sample_corpus")
    val audit = spark.sql(
      s"SELECT * FROM graft_sample_audit('$dir/kmv', 'sql_sample_corpus')")
    val auditDirect = graft.text.KmvSample.auditMeanTokens(
      smDirect, spark.table("sql_sample_corpus"))
    assert(audit.columns === auditDirect.columns)
    assert(rows(audit) === rows(auditDirect))
    // every doc has exactly 3 tokens: the sample mean is EXACT here
    assert(rows(audit).head ===
      Seq(16L, 120L, 3000L, 3000L, 0L))
    // the stratified mode through SQL: a per-language store serves the
    // balanced cut; the global store refuses it loudly
    graft.text.SampleStore.build(a.unionByName(b), s"$dir/kmvst", "a",
      k = 4, stratified = true)
    val st = spark.sql(s"SELECT * FROM graft_sample_strata('$dir/kmvst')")
    val stDirect = graft.text.SampleStore.serveStratified(spark, s"$dir/kmvst")
    assert(st.columns === stDirect.columns)
    assert(rows(st) === rows(stDirect))
    assert(st.groupBy("lang").count().as[(String, Long)].collect().toMap
      === Map("en" -> 4L, "de" -> 4L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_sample_strata('$dir/kmv')").collect()
    }
    assert(e.getMessage.contains("serveSample"))
    // the per-stratum audit through SQL: every doc has exactly 3
    // tokens, so both languages' estimates are EXACT here
    val sa = spark.sql("SELECT * FROM graft_sample_strata_audit(" +
      s"'$dir/kmvst', 'sql_sample_corpus')")
    assert(rows(sa) === Set(
      Seq("en", 4L, 50L, 3000L, 3000L, 0L),
      Seq("de", 4L, 70L, 3000L, 3000L, 0L)))
  }

  test("graft_rrf fuses two arbitrary rank-list tables from SQL") {
    Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
      .createOrReplaceTempView("sql_rrf_lex")
    Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
      .createOrReplaceTempView("sql_rrf_vec")
    val got = spark.sql(
      "SELECT doc_id, rank FROM graft_rrf('sql_rrf_lex', 'sql_rrf_vec', 10) " +
        "ORDER BY rank")
      .as[(Long, Int)].collect().toSeq
    // doc 20 is on both legs and must fuse to the top
    assert(got === Seq((20L, 1), (10L, 2), (30L, 3)))
  }

  test("graft_curation_spine / graft_spine_drop run the curation pipelines from SQL") {
    def mk(rws: (Long, String, String)*) = rws.toDF("doc_id", "lang", "text")
    val corpus = mk(
      // the one low-quality doc: TTR 1/6 — it absorbs the per-lang
      // bottom-quartile cut so the all-distinct docs below all pass the
      // gate and the dedup decision on (1, 2) is actually exercised
      (0L, "en", "pad pad pad pad pad pad"),
      (1L, "en", "alpha beta gamma delta eps"),
      (2L, "en", "alpha beta gamma delta eps"), // exact dup of 1 — loses
      (3L, "en", "one two three four five six"),
      (4L, "en", "seven eight nine ten eleven"),
      (5L, "de", "ein zwei drei vier funf"),
      (6L, "de", "sechs sieben acht neun zehn"),
      (7L, "en", "red green blue yellow pink"),
      (8L, "en", "cat dog bird fish cow"))
    corpus.createOrReplaceTempView("sql_spine_corpus")
    val target = mk((100L, "en", "one two three cat dog"))
    target.createOrReplaceTempView("sql_spine_target")
    val bench = Seq((200L, "zz zz zz zz")).toDF("doc_id", "text")
    bench.createOrReplaceTempView("sql_spine_bench")
    val viaSql = spark.sql("SELECT * FROM graft_curation_spine(" +
      "'sql_spine_corpus', 'sql_spine_target', 'sql_spine_bench', 4)")
    val direct = graft.text.Curation.spineSelection(
      corpus, target, bench, k = 4)
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    assert(!viaSql.select("doc_id").as[Long].collect().contains(2L),
      "the exact dup must not survive the spine's dedup stage")

    // the daily-drop form: history lives in the two ledgers
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlspine")
    graft.text.Store.build(corpus, s"$dir/sig")
    graft.text.DsirStore.build(corpus, s"$dir/dsir", "hist")
    val drop = mk(
      (50L, "en", "alpha beta gamma delta eps"), // re-crawl of history's 1
      (51L, "en", "totally fresh words here now"),
      (52L, "en", "more novel text content today"))
    drop.createOrReplaceTempView("sql_spine_dropt")
    val gotSql = spark.sql("SELECT * FROM graft_spine_drop(" +
      s"'sql_spine_dropt', 'sql_spine_target', 'sql_spine_bench', " +
      s"'$dir/sig', '$dir/dsir', 2)")
    val gotDirect = graft.text.Curation.incrementalSpineSelection(
      drop, target, bench, s"$dir/sig", s"$dir/dsir", k = 2)
    assert(gotSql.columns === gotDirect.columns)
    assert(rows(gotSql) === rows(gotDirect))
    assert(!gotSql.select("doc_id").as[Long].collect().contains(50L),
      "a re-crawl of a stored doc must fall to the store-served dedup")
  }

  test("graft_drop_funnel censuses the daily-drop spine from SQL") {
    def mk(rws: (Long, String, String)*) = rws.toDF("doc_id", "lang", "text")
    val hist = mk(
      (0L, "en", "pad pad pad pad pad pad"),
      (1L, "en", "alpha beta gamma delta eps"),
      (3L, "en", "one two three four five six"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlfunnel")
    graft.text.Store.build(hist, s"$dir/sig")
    graft.text.DsirStore.build(hist, s"$dir/dsir", "hist")
    val drop = mk(
      (50L, "en", "alpha beta gamma delta eps"), // re-crawl — dedup cut
      (51L, "en", "totally fresh words here now"),
      (52L, "en", "more novel text content today"),
      (53L, "en", "low low low low low low"))    // bottom quartile — gate cut
    drop.createOrReplaceTempView("sql_funnel_drop")
    mk((100L, "en", "one two three cat dog"))
      .createOrReplaceTempView("sql_funnel_target")
    Seq((200L, "zz zz zz zz")).toDF("doc_id", "text")
      .createOrReplaceTempView("sql_funnel_bench")
    val viaSql = spark.sql("SELECT * FROM graft_drop_funnel(" +
      s"'sql_funnel_drop', 'sql_funnel_target', 'sql_funnel_bench', " +
      s"'$dir/sig', '$dir/dsir', 2)")
    val direct = graft.text.Curation.incrementalSpineFunnel(
      drop, spark.table("sql_funnel_target"),
      spark.table("sql_funnel_bench"), s"$dir/sig", s"$dir/dsir", k = 2)
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    val byStage = viaSql.select("stage", "n_docs")
      .as[(String, Long)].collect().toMap
    assert(byStage("corpus") === 4L)
    assert(byStage("gated") === 3L, "the quartile gate cuts doc 53")
    assert(byStage("deduped") === 2L, "the store serve cuts the re-crawl")
  }

  test("graft_binary_neardup pairs byte-identical-run payloads from SQL") {
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zet"),   // shared byte runs
      (3L, "completely different content here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .createOrReplaceTempView("sql_bin_media")
    val viaSql = spark.sql(
      "SELECT * FROM graft_binary_neardup('sql_bin_media')")
    val direct = graft.multimodal.Binary.nearDupPayloadPairs(
      spark.table("sql_bin_media"))
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
    assert(viaSql.select("doc_a", "doc_b").as[(Long, Long)].collect()
      .toSet === Set((1L, 2L)))
  }

  test("graft_store_dedup serves both store universes from SQL") {
    val dir = java.nio.file.Files.createTempDirectory("sql-store").toString
    // text store: one long doc; the drop re-sends it plus a fresh doc
    val corpusText = (1 to 30).map(i => s"s$i").mkString(" ")
    graft.text.Store.build(
      Seq((1L, corpusText)).toDF("doc_id", "text"), s"$dir/txt")
    Seq((10L, corpusText), (11L, (50 to 80).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_store_drop")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_store_dedup('sql_store_drop', '$dir/txt')")
    assert(viaSql.select("doc_id").as[Long].collect().toSet === Set(11L),
      "the stored near-dup drops; the fresh doc survives")

    // bytes store: marker-driven byte prep through the SAME TVF, only
    // the content-col argument changes
    def blob(seed: Int, n: Int = 400): Array[Byte] = {
      var x = seed * 0x9E3779B97F4A7C15L
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    graft.text.Store.build(
      Seq((1L, blob(1))).toDF("doc_id", "payload"), s"$dir/bin",
      textCol = "payload", universe = graft.text.Store.Universe.PayloadBytes)
    Seq((10L, blob(1).take(384)), (11L, blob(9)))
      .toDF("doc_id", "payload").createOrReplaceTempView("sql_binstore_drop")
    val viaSqlBin = spark.sql(
      s"SELECT * FROM graft_store_dedup('sql_binstore_drop', '$dir/bin', 'payload')")
    assert(viaSqlBin.select("doc_id").as[Long].collect().toSet === Set(11L),
      "the truncated payload dedups against the bytes store from SQL")
  }

  test("spine/funnel TVF usage strings state the execute-cost model") {
    // the SQL user's only doc surface is the usage string — the cost
    // model (EXPLAIN-safe analysis; how execution shares stage state)
    // must live THERE, not only in scaladoc a SQL user never sees
    def usageOf(sqlText: String): String =
      intercept[Exception](spark.sql(sqlText).collect()).getMessage
    val spine = usageOf("SELECT * FROM graft_curation_spine('x')")
    assert(spine.contains("EXPLAIN-safe") && spine.contains("lazy caches"))
    val funnel = usageOf("SELECT * FROM graft_drop_funnel('x')")
    assert(funnel.contains("EXPLAIN-safe") && funnel.contains("Single-pass"))
  }

  test("graft_fp_store serves partial-copy pairs from SQL, both universes") {
    val dir = java.nio.file.Files.createTempDirectory("sql-fpstore").toString
    def blob(seed: Int, n: Int = 300): Array[Byte] = {
      var x = seed * 0x9E3779B97F4A7C15L
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    // bytes store: history doc 1 carries a 64-byte block; the drop doc
    // embeds the same block inside otherwise-unrelated bytes — the
    // partial-copy case the signature store (whole-set similarity) misses
    val block = blob(7, 64)
    graft.text.FpStore.build(
      Seq((1L, blob(1) ++ block)).toDF("doc_id", "payload"), s"$dir/bin",
      contentCol = "payload",
      universe = graft.text.Store.Universe.PayloadBytes)
    Seq((10L, block ++ blob(9)), (11L, blob(5)))
      .toDF("doc_id", "payload").createOrReplaceTempView("sql_fp_drop")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_fp_store('sql_fp_drop', '$dir/bin', 'payload')")
    assert(viaSql.columns === Array("doc_a", "doc_b", "n_shared"))
    assert(viaSql.select("doc_a", "doc_b").as[(Long, Long)].collect()
      .toSet === Set((10L, 1L)),
      "the embedded-copy pair, drop doc first; the fresh doc pairs nothing")
    // text store through the SAME TVF — marker-driven prep
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    graft.text.FpStore.build(
      Seq((1L, run + " " + (1 to 20).map(i => s"a$i").mkString(" ")))
        .toDF("doc_id", "text"), s"$dir/txt")
    Seq((10L, (1 to 20).map(i => s"z$i").mkString(" ") + " " + run))
      .toDF("doc_id", "text").createOrReplaceTempView("sql_fp_drop_txt")
    val viaSqlTxt = spark.sql(
      s"SELECT * FROM graft_fp_store('sql_fp_drop_txt', '$dir/txt')")
    assert(viaSqlTxt.select("doc_a", "doc_b").as[(Long, Long)].collect()
      .toSet === Set((10L, 1L)),
      "the shared 12-word run pairs through the text-universe marker")
  }

  test("graft_hash_store serves re-encode pairs from SQL; usage names the contract") {
    val dir = java.nio.file.Files.createTempDirectory("sql-hashstore").toString
    def blob(seed: Int, n: Int = 300): Array[Byte] = {
      var x = seed * 0x9E3779B97F4A7C15L
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    // bytes leg, an exact re-upload (Hamming 0): the TVF test gates the
    // SQL plumbing — drop-vs-store orientation, schema, laziness, usage;
    // the hash ROBUSTNESS semantics are q212's oracle gate and
    // MultimodalSpec's planted twins (random blobs are simhash's
    // adversarial case: every vote margin is ~√n, so small edits flip
    // bits — real payloads share grams, random ones share nothing)
    val base = blob(1, 400)
    graft.multimodal.HashStore.build(
      Seq((1L, base), (3L, blob(5, 400))).toDF("doc_id", "payload"),
      s"$dir/hs", modalities = Seq("bytes"))
    Seq((10L, base.clone()), (11L, blob(9, 400)))
      .toDF("doc_id", "payload").createOrReplaceTempView("sql_hash_drop")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_hash_store('sql_hash_drop', '$dir/hs', 'bytes')")
    assert(viaSql.columns === Array("doc_a", "doc_b", "modality", "hamming"))
    assert(viaSql.select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet === Set((10L, 1L, 0)),
      "the re-uploaded twin pairs at Hamming 0, drop doc first")
    // the TVF face must never run the drop's decode/hash job at analysis
    // time (eager = false): explain alone is safe
    spark.sql(
      s"EXPLAIN SELECT * FROM graft_hash_store('sql_hash_drop', '$dir/hs')")
      .collect()
    // usage string states the contract loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_hash_store('x')").collect()
    }
    assert(e.getMessage.contains("banded 64-bit-Hamming") &&
      e.getMessage.contains("image,audio,bytes"))
  }

  test("graft_retrieve_crops / graft_retrieve_clips: containment probes from SQL, stamped geometry") {
    // image leg end-to-end (the crop question); the audio leg shares the
    // same retrieveByLeg core and is exercised at the refusal level —
    // MultimodalSpec owns the waveform-level retrieval semantics
    val dir = java.nio.file.Files.createTempDirectory("sql-retrieve").toString
    def textured(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (((x * (2654435761L + seed * 101L) +
          y * (40503L + seed * 7L)) >>> 7) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    graft.multimodal.HashStore.build(
      Seq((1L, textured(256, 192, 1L)), (3L, textured(256, 192, 99L)))
        .toDF("doc_id", "payload"),
      s"$dir/hs", modalities = Seq("image", "image_tile"), tilePx = 64)
    // the probe: doc 1's texture re-rendered from global offset (64, 64)
    // — pixel-identical to the tile-aligned crop
    def cropped(w: Int, h: Int, ox: Int, oy: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((((x + ox) * (2654435761L + 101L) +
          (y + oy) * (40503L + 7L)) >>> 7) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    Seq((100L, cropped(192, 128, 64, 64)))
      .toDF("doc_id", "payload").createOrReplaceTempView("sql_crop_probe")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_retrieve_crops('sql_crop_probe', '$dir/hs')")
    assert(viaSql.columns === Array("probe_id", "doc_id", "n_matched"))
    assert(viaSql.as[(Long, Long, Long)].collect().toSet ===
      Set((100L, 1L, 6L)),
      "the tile-aligned crop retrieves exactly its source from SQL")
    // analysis must never run the probe's decode job (eager = false)
    spark.sql(
      s"EXPLAIN SELECT * FROM graft_retrieve_crops('sql_crop_probe', '$dir/hs')")
      .collect()
    // the audio face refuses this store loudly — the leg isn't enrolled
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_retrieve_clips('sql_crop_probe', '$dir/hs')")
    }
    assert(e.getMessage.contains("audio_win"))
    // usage strings state the contract loudly
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_retrieve_crops('x')").collect()
    }
    assert(e2.getMessage.contains("image_tile") &&
      e2.getMessage.contains("stamped"))
  }

  test("graft_retrieve_spans: the byte-universe containment probe from SQL") {
    // the oracle-checkable retrieval leg (q214): a hop-trimmed byte
    // span finds its source through the stamped bytes_win geometry
    val dir = java.nio.file.Files.createTempDirectory("sql-ret-span").toString
    def bytesOf(seed: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i * seed + 11) % 251).toByte)
    val target = bytesOf(2654435761L, 400)
    graft.multimodal.HashStore.build(
      Seq((1L, target), (3L, bytesOf(40503L, 400))).toDF("doc_id", "payload"),
      s"$dir/hs", modalities = Seq("bytes_win"), winBytes = 64)
    Seq((100L, target.drop(32)))
      .toDF("doc_id", "payload").createOrReplaceTempView("sql_span_probe")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_retrieve_spans('sql_span_probe', '$dir/hs')")
    assert(viaSql.columns === Array("probe_id", "doc_id", "n_matched"))
    assert(viaSql.as[(Long, Long, Long)].collect().toSet ===
      Set((100L, 1L, 10L)),
      "the hop-trimmed span retrieves exactly its source from SQL")
    // a store without the leg refuses loudly, naming what IS enrolled
    graft.multimodal.HashStore.build(
      Seq((1L, target)).toDF("doc_id", "payload"),
      s"$dir/plain", modalities = Seq("bytes"))
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_retrieve_spans('sql_span_probe', '$dir/plain')")
    }
    assert(e.getMessage.contains("bytes_win"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_retrieve_spans('x')").collect()
    }
    assert(e2.getMessage.contains("bytes_win") &&
      e2.getMessage.contains("stamped"))
  }

  test("graft_manifest fingerprints from SQL, identical to the Column API") {
    docsView
    val viaSql = spark.sql(
      "SELECT * FROM graft_manifest('sql_docs', 'doc_id', 'text', 4)")
    val direct = graft.operators.Audit.manifest(
      spark.table("sql_docs"), "doc_id", Seq("text"), shards = 4)
    assert(viaSql.columns === direct.columns)
    assert(rows(viaSql) === rows(direct))
  }

  test("graft_profile_drift reports per-drop deltas from SQL") {
    docsView
    val dir = java.nio.file.Files.createTempDirectory("graft-sqldrift")
    graft.operators.ProfileStore.build(
      spark.table("sql_docs"), Seq("doc_id"), s"$dir/prof", "d0")
    graft.operators.ProfileStore.append(
      Seq((9L, "x")).toDF("doc_id", "text"), Seq("doc_id"), s"$dir/prof", "d1")
    val drift = spark.sql(s"SELECT * FROM graft_profile_drift('$dir/prof') " +
      "WHERE drop_id = 'd1'")
    assert(drift.select("d_rows").as[Long].head() === -3L,
      "d1 has 1 row vs d0's 4 — the shrink surfaces as -3")
  }

  test("TVF argument errors are loud and named") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_profile('sql_docs')").collect()
    }
    assert(e.getMessage.contains("graft_profile"))
  }
}
