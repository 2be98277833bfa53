package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.md5Long

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Both operators key on a content-stable hash (md5 of the id), NOT
  * on rand(): re-running the pipeline, adding executors, or
  * reordering input files never moves a row between splits — the
  * property a 100 TB train/val/test split must have. Pure map-side
  * except the bounded per-group window in [[stratified]].
  */
object Sampling {

  /** Split bucket in [0, 100) for an id column — stable across runs. */
  def splitBucket(id: Column): Column = md5Long(id.cast("string")) % 100

  /** Assign train/val/test by hash bucket: [0,pTrain) train,
    * [pTrain,pTrain+pVal) val, rest test.
    */
  def hashSplit(df: DataFrame, idCol: String, pTrain: Int, pVal: Int): DataFrame =
    df.withColumn("split",
      when(splitBucket(col(idCol)) < pTrain, "train")
        .when(splitBucket(col(idCol)) < pTrain + pVal, "val")
        .otherwise("test"))

  /** At most `perGroup` rows per group, chosen by hash order (a
    * deterministic uniform draw within each group). The shuffle
    * carries only group partitions; at scale swap the window for the
    * TopK bounded aggregate if groups are huge.
    */
  def stratified(df: DataFrame, groupCol: String, idCol: String,
                 perGroup: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(md5Long(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perGroup)
      .drop("_rn")
  }
}
