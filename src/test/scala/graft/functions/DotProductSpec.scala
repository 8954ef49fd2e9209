package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Native DotProduct Expression: value-equivalence with the composed
  * higher-order-function form (bit-identical left fold), null handling,
  * and codegen path. */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches composed zip_with/aggregate bit-for-bit on the corpus") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(Vectors.asDouble(col("embedding")).as("v"))
    val paired = e.withColumn("w", reverse(col("v")))
    val diff = paired.select(
        (Vectors.dot(col("v"), col("w")) - Vectors.dotComposed(col("v"), col("w"))).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff == 0.0)
  }

  test("known values, interpreted and codegen'd") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(Vectors.dot(col("a"), col("b"))).as[Double].head() == 32.0)
    // force the non-codegen (eval) path too
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = DotProduct(
      Literal.create(Array(1.0, 2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Array(4.0, 5.0, 6.0), ArrayType(DoubleType)))
    assert(expr.eval(null) == 32.0)
    assert(expr.nullSafeEval(
      ArrayData.toArrayData(Array(1.0, 0.5)), ArrayData.toArrayData(Array(2.0, 2.0))) == 3.0)
  }

  test("float arrays implicit-cast to double") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(Vectors.dot(col("a"), col("b"))).as[Double].head() == 11.0)
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(Vectors.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("graft_l2sq matches composed form bit-for-bit; eval path; SQL-callable") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(Vectors.asDouble(col("embedding")).as("v"))
    val paired = e.withColumn("w", reverse(col("v")))
    val diff = paired.select(
        (Vectors.l2sq(col("v"), col("w")) - Vectors.l2sqComposed(col("v"), col("w"))).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff == 0.0)
    // known value through codegen and the interpreted path
    val df = Seq((Array(1.0, 2.0), Array(4.0, 6.0))).toDF("a", "b")
    assert(df.select(Vectors.l2sq(col("a"), col("b"))).as[Double].head() == 25.0)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = SqDist(
      Literal.create(Array(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Array(4.0, 6.0), ArrayType(DoubleType)))
    assert(expr.eval(null) == 25.0)
    df.createOrReplaceTempView("l2sq_fixture")
    assert(spark.sql("SELECT graft_l2sq(a, b) FROM l2sq_fixture")
      .as[Double].head() == 25.0)
  }
}
