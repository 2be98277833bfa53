package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The engine-wide contract is `ts` = epoch-nanos Long: exact integer
    * nanos make every window/gap/lag comparison engine-exact (no double
    * rounding at boundaries). Early testdata generations stored
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * nanosAsLong reads it as that Long directly); the round-9
    * generation stores TIMESTAMP(MICROS), so when the file arrives as
    * a timestamp type we rebuild the nanos Long from unix_micros. The
    * NTZ→timestamp cast is wall-clock-preserving because every session
    * in this repo (Verify/Bench/specs) pins spark.sql.session.timeZone
    * to UTC; the DuckDB oracle side applies the same contract via the
    * events-shadowing CTE in [[graft.SparkEntry.oracleSql]].
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→timestamp cast below is only wall-clock-correct under
    // UTC; enforce it here (not just in Verify/Bench/spec sessions) so
    // an ad-hoc session in another zone can't silently get shifted
    // epoch-nanos
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
            * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
