package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorExpressions, VectorFunctions}

class VectorExpressionsSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir).limit(100)

  test("native cosine is bit-identical to the HOF formulation") {
    val q = graft.store.VectorStore.queryVecOf(spark, sfDir, 7)
    val both = emb.crossJoin(broadcast(q)).select(
      col("vec_id"),
      VectorExpressions.cosine(col("embedding"), col("q")).as("native"),
      VectorFunctions.cosineSimHof(col("embedding"), col("q")).as("hof"))
    val rows = both.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"vec ${r.getLong(0)}: native=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
  }

  test("native expressions work on double arrays and mixed types") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("d"),
      VectorExpressions.sqNorm(col("a")).as("n")).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 14.0)
  }

  test("SQL registration: cosine_similarity usable from spark.sql") {
    VectorExpressions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT cosine_similarity(a.embedding, b.embedding) AS c
        |FROM emb_v a JOIN emb_v b ON a.vec_id = 0 AND b.vec_id = 0""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("interpreted (non-codegen) path matches the codegen path") {
    val conf = spark.conf
    val prevWS = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFM = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val q = graft.store.VectorStore.queryVecOf(spark, sfDir, 7)
    def run(): Array[(Long, Double)] =
      emb.crossJoin(broadcast(q))
        .select(col("vec_id"), VectorExpressions.cosine(col("embedding"), col("q")).as("c"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val codegen = run()
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = run()
      assert(codegen.toSeq == interpreted.toSeq)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWS)
      conf.set("spark.sql.codegen.factoryMode", prevFM)
    }
  }

  test("native md5 long60 equals the conv(substring(md5)) formulation") {
    val sp = spark
    import sp.implicits._
    // corpus strings (incl. empty + unicode-ish) and synthetic ids
    val docs = Tables.documents(spark, sfDir)
      .select(col("text").as("s"))
      .union(spark.range(1000).select(concat(lit("id_"), col("id")).as("s")))
      .union(Seq("", " ", "é☃", "a\nb").toDF("s"))
    val diffs = docs.select(
        VectorFunctions.md5Long(col("s")).as("a"),
        VectorFunctions.md5LongConv(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diffs == 0)
    // non-negative 60-bit range
    val mn = docs.select(min(VectorFunctions.md5Long(col("s")))).head().getLong(0)
    assert(mn >= 0L)
  }

  test("md5Long compiles under CODEGEN_ONLY (no interpreted fallback)") {
    // Regression for the round-2 verdict: Md5Long60's generated code
    // referenced a nested Scala object with no static forwarder, so
    // Janino failed and the whole hash family silently ran
    // interpreted. CODEGEN_ONLY + fallback=false turn that silent
    // fallback into a test failure.
    val conf = spark.conf
    val prevFM = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevFB = conf.get("spark.sql.codegen.fallback", "true")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = Tables.documents(spark, sfDir)
        .select(VectorFunctions.md5Long(col("text")).as("h"))
        .filter(col("h") >= 0L).count()
      assert(n > 0)
      // the cosine/dot/sqNorm family too, same guarantee
      val q = graft.store.VectorStore.queryVecOf(spark, sfDir, 7)
      val c = emb.crossJoin(broadcast(q))
        .select(VectorExpressions.cosine(col("embedding"), col("q")).as("c"),
          VectorExpressions.dot(col("embedding"), col("q")).as("d"),
          VectorExpressions.sqNorm(col("q")).as("n"))
        .count()
      assert(c == 100)
    } finally {
      conf.set("spark.sql.codegen.factoryMode", prevFM)
      conf.set("spark.sql.codegen.fallback", prevFB)
    }
  }

  test("null inputs yield null, zero vectors yield 0.0") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Array(0.0f, 0.0f)), Array(1.0f, 2.0f)), (None, Array(1.0f, 2.0f)))
      .toDF("a", "b")
    val rows = df.select(VectorExpressions.cosine(col("a"), col("b")).as("c")).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).isNullAt(0))
  }
}
