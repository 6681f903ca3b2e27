package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays as a native codegen'd Catalyst
  * expression (SURVEY.md §2.10 escape-hatch policy).
  *
  * Why not `aggregate(zip_with(...))`: the higher-order-function form
  * allocates a zipped intermediate array and evaluates an interpreted
  * lambda per element — measured ~10× slower on 64-dim vectors, and it
  * forces an up-front `transform(embedding, x -> CAST(x AS DOUBLE))` pass.
  * This expression reads float or double elements directly from the
  * columnar ArrayData and emits a tight primitive loop under whole-stage
  * codegen. Cosine similarity and L2 norms compose from it:
  * `DotProduct(a, b) / (sqrt(DotProduct(a, a)) * sqrt(DotProduct(b, b)))`.
  *
  * Semantics: pairwise product-sum over the common prefix length; null
  * elements are skipped (contribute 0); null array → null. Float elements
  * are widened to double before multiplying, so results are bit-identical
  * to an engine computing in double from the same float values.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val la = elemType(left) == FloatType
    val lb = elemType(right) == FloatType
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (lb) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, e: Expression, i: String): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${get(a, left, i)} * ${get(b, right, i)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two ASCENDING-SORTED long arrays —
  * the hot primitive of every candidate-pair Jaccard verify
  * (`|A ∩ B|` over per-doc shingle-hash sets).
  *
  * Why not `size(array_intersect(a, b))`: that builds a hash set from one
  * side AND materializes the intersection array, per pair — pure
  * allocation for a value we immediately reduce to its length. With both
  * sides sorted once at build time (`array_sort` in the per-doc
  * aggregate, amortized over every pair the doc appears in), the count
  * is a two-pointer merge: zero allocation, no hashing, branch-friendly,
  * whole-stage-codegen'd. Duplicate elements are counted once per match
  * step (inputs are DISTINCT sets by construction here). Null elements
  * are not expected (shingle hashes are non-null; `collect_list` drops
  * nulls) and are treated as ordinary values by position. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |int ${i}n = $a.numElements(); int ${j}n = $b.numElements();
         |while ($i < ${i}n && $j < ${j}n) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity composed from three dot products. Callers that reuse
    * norms across many pairs should precompute `DotProduct(v, v)` once. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    DotProduct(a, b) / (sqrt(DotProduct(a, a)) * sqrt(DotProduct(b, b)))
  }
}
