package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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

    // ALL right payload columns ride in ONE struct carried by a single
    // last(ignoreNulls): the struct is non-null for every right row even
    // when its members are NULL, so the latest right row's values arrive
    // atomically — per-column carry would stitch a newer NULL member
    // together with an older non-null one (rows that never coexisted).
    val payloadType = StructType(rightCols.map(c => StructField(c, rightTypes(c))))

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(rightTypes(rightTieBreak)))
      .withColumn("_r", lit(null).cast(payloadType))

    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieBreak))
      .withColumn("_r", struct(rightCols.map(col): _*))

    val unioned = l
      .select((Seq(key, "_t", "_side", "_tie", "_r")
        ++ left.columns.filter(_ != key)).distinct.map(col): _*)
      .unionByName(
        r.select(Seq(key, "_t", "_side", "_tie", "_r").map(col): _*),
        allowMissingColumns = true)

    // right rows sort before left rows at equal times => inclusive "<="
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))

    carried
      .where(col("_side") === 1)
      .select((left.columns.map(col) ++
        rightCols.map(c => col("_asof").getField(c).as(c))): _*)
  }
}
