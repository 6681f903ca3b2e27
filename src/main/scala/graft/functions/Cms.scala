package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the bytes Spark's built-in
  * `count_min_sketch(...)` aggregate emits) for a key's estimated count —
  * IN-PLAN, so the sketch build and its probes execute lazily inside the
  * query instead of as driver-side actions at construction time.
  *
  * Intended shape: `topKeys.crossJoin(broadcast(sketchAgg))` — the sketch
  * frame is one row, so every probe row in a partition sees the SAME byte
  * array object; the deserialized sketch is cached by reference identity
  * and decoded once per partition, not per row. The probe side is
  * response-scale by contract (top-N keys, tens of rows), which is why
  * this is a [[CodegenFallback]] rather than a codegen'd hot-path
  * expression — unlike [[BloomMightContain]], which gates full scans and
  * therefore requires a foldable filter + generated code. */
case class CmsEstimateCount(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "cms_estimate_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate_count requires a BINARY sketch, got ${left.dataType.sql}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate_count requires a BIGINT key, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private var cachedRef: Array[Byte] = _
  @transient private var cached: CountMinSketch = _

  override def nullSafeEval(bytes: Any, key: Any): Any = {
    val b = bytes.asInstanceOf[Array[Byte]]
    if (!(b eq cachedRef)) {
      cached = CountMinSketch.readFrom(new ByteArrayInputStream(b))
      cachedRef = b
    }
    cached.estimateCount(key.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateCount =
    copy(left = newLeft, right = newRight)
}

object CmsEstimateCount {
  def apply(sketch: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimateCount(
      ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
}
