package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSpec {

  test("saltedJoin produces the same rows as a plain equi-join") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = l.join(o, "l_orderkey").count()
    val salted = Skew.saltedJoin(l, o, "l_orderkey", saltBy = "l_partkey").count()
    assert(plain == salted)
  }
}
