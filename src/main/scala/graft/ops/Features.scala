package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Supervised-training row generation from an event log — the
  * feature/label framing step of a next-event-prediction pipeline
  * (churn, next-action, dwell modelling): for every event, features come
  * from the PREVIOUS event (its type, the dwell gap) and the label is
  * the current event's type. The model answers "given what the user just
  * did, what happens next?".
  *
  * One hash exchange on the entity key serves all three window
  * expressions (lag type, lag ts, row_number); the label join is free
  * because label and features live on the same row after the lags — no
  * self-join of the log against itself shifted by one (the join form
  * shuffles twice and breaks on duplicate timestamps).
  */
object Features {

  /** (user, event_id, seq_n, prev_type, dwell_s, label) rows; the first
    * event per user has no features and is dropped. `ts` is an ns-epoch
    * long; `tiebreak` makes (user, ts, tiebreak) unique. */
  def nextEventRows(events: DataFrame, user: String, ts: String,
                    tiebreak: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(user).orderBy(col(ts), col(tiebreak))
    events
      .withColumn("seq_n", row_number().over(w))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .withColumn("gap_ns", col(ts) - lag(col(ts), 1).over(w))
      .withColumn("dwell_s", expr("gap_ns div 1000000000"))
      .filter(col("seq_n") >= 2)
      .select(col(user), col(tiebreak), col("seq_n"), col("prev_type"),
        col("dwell_s"), col(typeCol).as("label"))
  }

  /** Out-of-fold (leakage-safe) target encoding of a categorical
    * column — the standard mean-encoding feature for tabular models,
    * built so no row's own target ever contributes to its feature:
    * rows are assigned to `folds` folds by the keyed PRNG (layout- and
    * cluster-independent, reproducible), and fold f's encoding of a
    * category is the target mean over the OTHER folds, smoothed toward
    * the (also out-of-fold) global mean with pseudo-count `smoothing`
    * — the empirical-Bayes shrinkage that keeps rare categories from
    * memorizing their few labels.
    *
    * Returns the ENCODING TABLE, (cat, fold) → (n_fold, n_oof,
    * enc_raw, enc_smooth): |categories|×folds rows, the broadcastable
    * artifact a feature pipeline joins onto training rows (serving
    * joins the full-data variant; this table is the train-time one).
    * A category seen ONLY inside one fold has no out-of-fold evidence:
    * `enc_raw` is null and `enc_smooth` collapses to the global mean —
    * the correct cold-start answer, not an accidental label leak.
    *
    * Scale: one (cat, fold) grouped aggregate with map-side partials;
    * every window below it runs on that aggregate-sized frame. Sums
    * stay decimal-exact; the global mean is rounded to 6 dp BEFORE the
    * smoothing arithmetic so both engines shrink toward the identical
    * constant.
    */
  def targetEncodeOof(df: DataFrame, cat: Column, key: Column,
                      target: Column, folds: Int, smoothing: Int,
                      seed: Long): DataFrame = {
    val rows = df.select(cat.as("cat"),
      pmod(graft.functions.GraftFunctions.md5_63(
        concat(lit(seed.toString), lit(":"), key.cast("string"))),
        lit(folds)).cast("int").as("fold"),
      graft.functions.GraftFunctions.qdec(target, 18, 2).as("v"))

    val perFold = rows.groupBy("cat", "fold")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))

    val byCat = Window.partitionBy("cat")
    val byFold = Window.partitionBy("fold")
    val all = Window.partitionBy()
    val enc = perFold
      .withColumn("tot_cnt", sum("cnt").over(byCat))
      .withColumn("tot_s", sum("s").over(byCat))
      .withColumn("f_cnt", sum("cnt").over(byFold))
      .withColumn("f_s", sum("s").over(byFold))
      .withColumn("g_cnt", sum("cnt").over(all))
      .withColumn("g_s", sum("s").over(all))
      .withColumn("g_oof", qround(
        (col("g_s") - col("f_s")).cast("double") /
          (col("g_cnt") - col("f_cnt")).cast("double"), 6))
      .withColumn("oof_cnt", col("tot_cnt") - col("cnt"))
      .withColumn("enc_raw", when(col("oof_cnt") > 0, qround(
        (col("tot_s") - col("s")).cast("double") /
          col("oof_cnt").cast("double"), 6)))
      .withColumn("enc_smooth", qround(
        ((col("tot_s") - col("s")).cast("double") +
          lit(smoothing.toDouble) * col("g_oof")) /
          (col("oof_cnt") + lit(smoothing)).cast("double"), 6))
    enc.select(col("cat"), col("fold"), col("cnt").as("n_fold"),
      col("oof_cnt").as("n_oof"), col("enc_raw"), col("enc_smooth"))
  }

  /** The hashing trick (signed feature hashing, Weinberger et al. 2009,
    * public): project an unbounded token vocabulary into `buckets`
    * dimensions with NO vocabulary pass — bucket and sign are pure
    * hashes of the token, so the encoding needs no fitted dictionary,
    * no broadcast state, and is identical on any cluster (and in the
    * DuckDB oracle). The ± sign hash makes collisions cancel in
    * expectation, which keeps hashed inner products unbiased — the
    * property that lets linear models train on the hashed space.
    *
    * Output: sparse (id, bucket, val = Σ sign, n_tokens) rows — at most
    * `buckets` per document regardless of length. One (id, bucket)
    * grouped aggregate with map-side partials; integer-exact.
    */
  def hashedTokenFeatures(df: DataFrame, id: String, text: String,
                          buckets: Int, seed: Long): DataFrame = {
    val md5 = graft.functions.GraftFunctions.md5_63 _
    df.select(col(id), explode(split(col(text), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(id),
        pmod(md5(concat(lit(s"$seed:b:"), col("tok"))), lit(buckets))
          .cast("int").as("bucket"),
        when(pmod(md5(concat(lit(s"$seed:s:"), col("tok"))), lit(2)) === 0,
          1).otherwise(-1).as("sign"))
      .groupBy(col(id), col("bucket"))
      .agg(sum("sign").as("val"), count(lit(1)).as("n_tokens"))
  }
}
