package graft.io

import graft.rec.Popularity

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Split-persistence pipeline (reference S3 end-to-end,
  * `codes/Movie Recommendation/part3/partition.py:39-51`): materialize the
  * chronological train/validation/test splits as three directories and
  * read them back, so downstream jobs (baseline eval, ALS, grid search)
  * consume stable on-disk splits instead of recomputing the window.
  *
  * Parquet, not the reference's CSV: typed, compressed, prunable — the
  * 100 TB posture. One pass over the tagged frame per split; each filter
  * pushes down to the scan on read-back. `writeCsv`/`readCsv` remain the
  * CSV parity surface ([[Tables]]).
  */
object Splits {

  val names = Seq("train", "validation", "test")

  /** Write `ratings` (any frame accepted by [[Popularity.withSplits]])
    * as `<outDir>/{train,validation,test}` parquet dirs. Overwrites. */
  def persist(ratings: DataFrame, outDir: String): Unit = {
    val tagged = Popularity.withSplits(ratings)
    val splits = Seq(
      "train" -> Popularity.train(tagged),
      "validation" -> Popularity.validation(tagged),
      "test" -> Popularity.test(tagged))
    splits.foreach { case (name, df) =>
      df.drop("split").write.mode("overwrite").parquet(s"$outDir/$name")
    }
  }

  /** Read back the three persisted splits as (train, validation, test). */
  def read(spark: SparkSession, outDir: String): (DataFrame, DataFrame, DataFrame) = {
    val Seq(t, v, s) = names.map(n => spark.read.parquet(s"$outDir/$n"))
    (t, v, s)
  }
}
