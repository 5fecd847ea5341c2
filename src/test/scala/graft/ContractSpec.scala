package graft

/** Driver-contract invariants: keeps future operator additions honest. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query; every query has an oracle (or is documented rows-only)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without query: ${o -- q}")
    // current inventory is fully oracle-checked; if a rows-only op is ever
    // added, list it here explicitly instead of silently weakening the gate
    val rowsOnly = Set.empty[String]
    assert((q -- o) == rowsOnly, s"query without oracle: ${q -- o -- rowsOnly}")
  }

  test("SURVEY §2 lists every registered query (the inventory is the grading contract)") {
    // an operator missing from the SURVEY checklist is invisible to review;
    // this failed silently twice before — enforce the sync mechanically
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val section2 = survey.split("## §2")(1).split("## §3")(0)
    val listed = "`([a-z0-9_\\.]+)`".r.findAllMatchIn(section2).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet.filterNot(listed.contains)
    assert(missing.isEmpty, s"queries absent from SURVEY.md §2: $missing")
  }

  test("every query's plan analyzes against the test data (no wiring breaks)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sf).schema // analysis only, no execution
      assert(schema.fields.nonEmpty, name)
    }
  }

  test("orderedOutput=false removes the terminal global sort from library plans") {
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    // representative per-document queries whose ONLY sort is the contract's
    // terminal ORDER BY (top-k queries keep theirs — it's semantic there);
    // assert on the optimized LOGICAL plan (AQE hides the physical tree)
    val perDoc = Seq("dedup_exact", "extract_fields", "split_assign",
      "form_complete", "token_count", "text_normalize")
    def globalSorts(name: String): Int = {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      plan.collect { case s: Sort if s.global => s }.size
    }
    perDoc.foreach { name =>
      assert(globalSorts(name) > 0, s"$name: contract path should globally sort")
    }
    spark.conf.set(graft.operators.OrderedOutputKey, "false")
    try perDoc.foreach { name =>
      assert(globalSorts(name) == 0,
        s"$name: library path (orderedOutput=false) must not globally sort")
    } finally spark.conf.set(graft.operators.OrderedOutputKey, "true")
  }

  test("oracle SQL is ASCII-only and JSON-escapable (driver reads it via json.load)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.forall(_ < 128.toChar), s"$name contains non-ASCII")
      // no control characters besides newline (invisible NUL/tab would
      // survive into the JSON and break the driver compare subtly)
      assert(sql.forall(c => c >= ' ' || c == '\n'), s"$name contains control chars")
    }
  }
}
