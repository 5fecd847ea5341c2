package graft

import org.apache.spark.sql.functions._

/** The native md5-prefix expressions must be BIT-IDENTICAL to the builtin
  * chains they replaced (r18) — any drift would silently shift every
  * shingle/winnow/n-gram hash in the engine while the oracle kept the
  * original arithmetic.
  */
class Md5HashSpec extends SparkSpec {

  import spark.implicits._

  private val samples = Seq(
    "", "a", "hello world", "πδ unicode Ж 漢字 🙂",
    "with'quote\"and\\backslash", "  spaces  ", "\n\t控制",
    (1 to 200).map(i => s"w$i").mkString(" "))

  test("graft_md5_long(s, start, len) ≡ cast(conv(substr(md5(s), start, len), 16, 10) as bigint)") {
    val df = samples.toDF("s")
    for ((start, len) <- Seq((1, 15), (1, 10), (1, 8), (9, 8), (1, 4), (3, 7), (17, 15))) {
      val rows = df.select(
        expr(s"graft_md5_long(s, $start, $len)").as("native"),
        expr(s"cast(conv(substr(md5(s), $start, $len), 16, 10) as bigint)").as("builtin"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"start=$start len=$len"))
    }
  }

  test("len=16 full-key mode is the signed view of the 16-hex string prefix (bijection)") {
    val rows = samples.toDF("s").select(
      expr("graft_md5_long(s, 1, 16)").as("native"),
      expr("substr(md5(s), 1, 16)").as("hex")).collect()
    rows.foreach { r =>
      val expected = java.lang.Long.parseUnsignedLong(r.getString(1), 16)
      assert(r.getLong(0) == expected)
    }
  }

  test("binary input hashes the raw bytes (matches md5 over binary)") {
    val rows = Seq(Array[Byte](0, 1, 2, -1, 127), Array[Byte]())
      .toDF("b").select(
        expr("graft_md5_long(b, 1, 15)").as("native"),
        expr("cast(conv(substr(md5(b), 1, 15), 16, 10) as bigint)").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_gram_hash(ws, k, len) ≡ the guarded transform(concat_ws → md5 → conv) chain") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "a", "", "x y z w v u t s r q p",
      "solo", "π δ Ж 漢字 🙂 done",
      (1 to 300).map(i => s"tok$i").mkString(" ")).toDF("text")
      .withColumn("ws", split(col("text"), " "))
    for ((k, len) <- Seq((3, 15), (2, 8), (4, 10), (1, 15), (5, 16))) {
      val parts = (1 to k).map(j => s"element_at(ws, i + $j)").mkString(", ")
      val chain =
        s"""CASE WHEN size(ws) < $k THEN cast(array() as array<bigint>)
           | ELSE transform(transform(sequence(0, size(ws) - $k), i -> concat_ws(' ', $parts)),
           |   g -> graft_md5_long(g, 1, $len)) END""".stripMargin.replace("\n", "")
      val rows = docs.select(
        expr(s"graft_gram_hash(ws, $k, $len)").as("native"),
        expr(chain).as("builtin")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k len=$len")
      }
    }
  }

  test("graft_gram_hash concat_ws semantics: null words contribute neither bytes nor separator") {
    val df = spark.sql("SELECT array('a', cast(null as string), 'b', 'c') AS ws")
    val rows = df.select(
      expr("graft_gram_hash(ws, 2, 15)").as("native"),
      expr("transform(sequence(0, size(ws) - 2), i -> " +
        "graft_md5_long(concat_ws(' ', element_at(ws, i + 1), element_at(ws, i + 2)), 1, 15))")
        .as("builtin")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("graft_min1 ≡ min over structs (and routes through ObjectHashAggregate, never SortAggregate)") {
    val df = Seq(
      (1L, java.math.BigDecimal.valueOf(-3.5), "b"),
      (1L, java.math.BigDecimal.valueOf(-3.5), "a"),
      (1L, java.math.BigDecimal.valueOf(-9.25), "z"),
      (2L, java.math.BigDecimal.valueOf(0.0), "x"),
      (3L, java.math.BigDecimal.valueOf(2.0), "q"),
      (3L, java.math.BigDecimal.valueOf(-2.0), "r"))
      .toDF("k", "ns", "lang")
      .withColumn("ns", col("ns").cast("decimal(19,6)"))
    val agg = df.groupBy("k")
      .agg(call_function("graft_min1", struct(col("ns"), col("lang"))).as("m1"),
        min(struct(col("ns"), col("lang"))).as("m2"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), "graft_min1 must hash-aggregate")
    agg.collect().foreach(r => assert(r.get(1) == r.get(2), s"k=${r.getLong(0)}"))
    // null-only group → null, like min
    val n = spark.sql(
      "SELECT graft_min1(s) FROM (SELECT cast(null as struct<a:int>) AS s)").collect()(0)
    assert(n.isNullAt(0))
  }

  test("graft_max_run ≡ the sorted equal-adjacent-run lambda (max multiplicity)") {
    val rows = Seq(
      Seq("a", "b", "a", "a", "c", "b"),
      Seq("x"),
      Seq.empty[String],
      Seq("t", "t", "t", "t")).toDF("bgs")
    val lambda =
      """aggregate(array_sort(bgs),
        | named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
        | (a, x) -> named_struct(
        |   'prev', x,
        |   'run', CASE WHEN a.prev <=> x THEN a.run + 1 ELSE 1L END,
        |   'best', greatest(a.best,
        |           CASE WHEN a.prev <=> x THEN a.run + 1 ELSE 1L END)),
        | a -> a.best)""".stripMargin.replace("\n", "")
    rows.select(expr("graft_max_run(array_sort(bgs))").as("native"),
        expr(lambda).as("lam")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null input yields null; too-short arrays yield empty") {
    val r = spark.sql(
      "SELECT graft_md5_long(cast(null as string), 1, 8) AS a, " +
        "graft_gram_hash(cast(null as array<string>), 3, 10) AS b, " +
        "graft_gram_hash(array('one', 'two'), 3, 10) AS c").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getSeq[Long](2).isEmpty)
  }
}
