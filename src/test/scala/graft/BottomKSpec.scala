package graft

import org.apache.spark.sql.functions._

class BottomKSpec extends SparkSpec {

  test("graft_bottomk equals sort+slice of collect_list, independent of partitioning") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (i % 7, f"v${(i * 37) % 1000}%03d")).toDF("g", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(expr("graft_bottomk(v, 3)").as("bk"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    val expected = data.groupBy("g")
      .agg(expr("slice(array_sort(collect_set(v)), 1, 3)").as("bk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    // partial aggregation across many partitions must not change the result
    assert(run(data.repartition(13)) == expected)
    assert(run(data.coalesce(1)) == expected)
  }

  test("graft_bottomk buffer stays bounded (serialize round-trip holds ≤ k entries)") {
    import graft.functions.BottomK
    val agg = BottomK(org.apache.spark.sql.catalyst.expressions.Literal("x"), k = 4)
    val buf = agg.createAggregationBuffer()
    (1 to 100).foreach(i => { buf += f"s$i%03d"; if (buf.size > 4) buf -= buf.last })
    assert(buf.size == 4)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
