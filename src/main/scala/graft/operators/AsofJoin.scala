package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively: for
  * every left row, attach the latest right row with the same key and
  * `rightTime <= leftTime`.
  *
  * Implemented with the scalable union + window formulation rather than
  * a range join: tag both inputs, sort each key's timeline once
  * (right rows before left rows on time ties, so "<=" holds), and carry
  * the most recent right payload forward with `last(_, ignoreNulls)`
  * over an unbounded-preceding frame. One shuffle on the key, linear
  * work per key — no quadratic candidate windows, skew handled by AQE
  * (or Skew.saltedJoin for pathological keys).
  */
object AsofJoin {

  /** @param rightCols right-side payload columns to attach (nullable on
    *                   no-match). Key and time columns must be identically
    *                   named on both sides or pre-aliased by the caller.
    * @note right rows tied on (key, time) are resolved by the LAST in
    *       `rightTieBreak` order — pre-dedupe the right side if the tie
    *       order matters.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(rightTypes(rightTieBreak)))
    val lWithNullPayload = rightCols.foldLeft(l)((df, c) =>
      df.withColumn(s"_r_$c", lit(null).cast(rightTypes(c))))

    val rBase = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieBreak))
    val r = rightCols.foldLeft(rBase)((df, c) => df.withColumn(s"_r_$c", col(c)))

    val unioned = lWithNullPayload
      .select((Seq(key, "_t", "_side", "_tie") ++ left.columns.filter(_ != key)
        ++ rightCols.map(c => s"_r_$c")).distinct.map(col): _*)
      .unionByName(
        r.select((Seq(key, "_t", "_side", "_tie") ++ rightCols.map(c => s"_r_$c")).map(col): _*),
        allowMissingColumns = true)

    // right rows sort before left rows at equal times => inclusive "<="
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"_asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w)))

    carried
      .where(col("_side") === 1)
      .select((left.columns.map(col) ++
        rightCols.map(c => col(s"_asof_$c").as(c))): _*)
  }
}
