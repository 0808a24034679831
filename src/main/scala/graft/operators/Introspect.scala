package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema introspection (SURVEY §2 O4): the notebook derives its
  * numeric-vs-categorical feature lists from dtypes
  * (`select_dtypes("int64","int32")` / `select_dtypes("bool")`,
  * cell 9 json:130-132). Same capability over StructType.
  */
object Introspect {

  def columnsOfType(df: DataFrame, types: DataType*): Seq[String] = {
    val wanted = types.toSet
    df.schema.fields.filter(f => wanted.contains(f.dataType)).map(_.name).toSeq
  }

  /** The notebook's "numeric" bucket (int32/int64 → Spark int/long). */
  def intCols(df: DataFrame): Seq[String] =
    columnsOfType(df, IntegerType, LongType)

  def boolCols(df: DataFrame): Seq[String] = columnsOfType(df, BooleanType)

  def numericCols(df: DataFrame): Seq[String] =
    columnsOfType(df, IntegerType, LongType, FloatType, DoubleType,
      ShortType, ByteType)
}
