package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{GwRuntimeFilteringScan, GwRuntimeFilterTranslation}

/**
 * Dynamic FILE pruning through Spark's runtime-filtering planner: a
 * broadcast join against a selective dim side must deliver the dim's key
 * set into the gwdelta scan at execution time (`SupportsRuntimeFiltering`)
 * and prune fact FILES by footer stats before they are opened — semi-join
 * reduction with zero manual orchestration.
 */
class DynamicPruningSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** The fact scans of the EXECUTED plan (AQE-final if adaptive,
    * descending into materialized query stages), with their scan. */
  private def factScans(df: DataFrame): Seq[(BatchScanExec, GwRuntimeFilteringScan)] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[(BatchScanExec, GwRuntimeFilteringScan)] =
      p.collect {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case b: BatchScanExec =>
          (b.scan match {
            case s: GwRuntimeFilteringScan => Some((b, s))
            case w: org.apache.spark.sql.graftbridge.GwDeltaScan =>
              w.innerScan match {
                case s: GwRuntimeFilteringScan => Some((b, s))
                case _ => None
              }
            case _ => None
          }).toSeq
      }.flatten
    walk(df.queryExecution.executedPlan)
  }

  test("broadcast join runtime-filters the fact scan to the files its keys can touch") {
    val loc = Files.createTempDirectory("dfp").resolve("lineitem").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    // 8 range-disjoint files on the join key: footer min/max carry the
    // layout the runtime IN-set prunes against
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.format("gwdelta").save(loc)
    val total = GwTable.forPath(spark, loc).snapshot().files.size
    assert(total >= 6, s"expected >= 6 range files, got $total")

    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") < 600) // selective: keys live in the low files
      .select("o_orderkey", "o_orderpriority")
    val fact = spark.read.format("gwdelta").load(loc)
    val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))

    val got = joined.collect().map(_.toSeq).sortBy(_.mkString("|"))
    // oracle: the same join straight over parquet
    val expected = li.join(
        spark.read.parquet(s"$sf/orders.parquet")
          .filter(col("o_orderkey") < 600).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.sameElements(expected), "runtime pruning changed the join result")

    val scans = factScans(joined)
    assert(scans.nonEmpty, "no runtime-filtering fact scan in the executed plan")
    val (b, s) = scans.head
    assert(b.runtimeFilters.nonEmpty,
      "the planner must insert a dynamic-pruning filter on the fact scan")
    assert(s.plannedFiles.size < total,
      s"runtime keys under 600 must prune the high-range files: " +
        s"planned ${s.plannedFiles.size} of $total")
  }

  test("runtime filtering re-plans the clean/DV split on a merge-on-read table") {
    // a DV'd table's runtime-filter rebuild goes through the same
    // assembleScan as the initial build: the clean/DV split re-derives
    // from the PRUNED candidates, and deleted rows stay deleted
    val loc = Files.createTempDirectory("dfp-mor").resolve("t").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    li.repartitionByRange(6, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.format("gwdelta").save(loc)
    val t = GwTable.forPath(spark, loc)
    assert(t.delete(col("l_quantity") >= 49.0, mergeOnRead = true) > 0)
    assert(t.snapshot().files.exists(_.dv.isDefined), "need DV'd files")
    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") < 600).select("o_orderkey")
    val fact = spark.read.format("gwdelta").load(loc)
    val got = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .agg(count(lit(1)), sum(round(col("l_quantity") * 100).cast("long")))
      .head()
    val expected = li.filter(col("l_quantity") < 49.0)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(round(col("l_quantity") * 100).cast("long")))
      .head()
    assert(got == expected, s"MOR + runtime filtering diverged: $got vs $expected")
  }

  test("pruning soundness property: random key sets never lose matching rows") {
    // end-to-end: if any stats/bloom path wrongly dropped a file, rows
    // would go missing from the isin result — seeded, deterministic
    val rnd = new scala.util.Random(20260815L)
    val loc = Files.createTempDirectory("dfp-prop").resolve("t").toString
    val rows = (0 until 4000).map(_ => rnd.nextLong() % 100000L)
    import spark.implicits._
    rows.toDF("k").repartitionByRange(7, col("k"))
      .sortWithinPartitions("k")
      .write.format("gwdelta").save(loc)
    val t = spark.read.format("gwdelta").load(loc)
    (1 to 5).foreach { _ =>
      val keys = (0 until (1 + rnd.nextInt(30)))
        .map(_ => if (rnd.nextBoolean()) rows(rnd.nextInt(rows.length))
                  else rnd.nextLong() % 100000L)
      val expected = rows.filter(keys.contains).sorted
      val got = t.filter(col("k").isin(keys.map(Long.box): _*))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected,
        s"pruned scan lost rows for keys ${keys.take(5)}...: " +
          s"${got.length} vs ${expected.length}")
    }
  }

  test("runtime filter translation: IN, comparisons, envelope fallback, safe failure") {
    import org.apache.spark.sql.sources
    val in = GwRuntimeFilterTranslation.toRanges(
      sources.In("k", Array(5L, 1L, 9L)))
    assert(in.size == 1 && in.head.anyOf.size == 3)
    assert(in.head.lower.contains(graft.log.Bound.Num(BigDecimal(1))) &&
      in.head.upper.contains(graft.log.Bound.Num(BigDecimal(9))))
    // above the member cap: the [min, max] envelope survives, anyOf drops
    val big = GwRuntimeFilterTranslation.toRanges(
      sources.In("k", (0 until 10001).map(i => Long.box(i.toLong)).toArray[Any]))
    assert(big.size == 1 && big.head.anyOf.isEmpty &&
      big.head.upper.contains(graft.log.Bound.Num(BigDecimal(10000))))
    val cmp = GwRuntimeFilterTranslation.toRanges(
      sources.And(sources.GreaterThan("k", 3), sources.LessThanOrEqual("k", 8)))
    assert(cmp.size == 2)
    // unknown kinds translate to NOTHING (prune nothing)
    assert(GwRuntimeFilterTranslation.toRanges(
      sources.In("k", Array[Any](1L, "mixed"))).isEmpty)
    assert(GwRuntimeFilterTranslation.toRanges(
      sources.EqualTo("a.b", 1L)).isEmpty, "nested refs must not translate")
  }

  test("runtime filter translation: dates as days, timestamps as micros gated on gwStatsV 2") {
    import org.apache.spark.sql.sources
    import graft.log.Bound
    // epoch-day encoding, both external date kinds
    val d1 = GwRuntimeFilterTranslation.toRanges(
      sources.EqualTo("d", java.time.LocalDate.parse("1995-03-15")))
    val days = java.time.LocalDate.parse("1995-03-15").toEpochDay
    assert(d1 == Seq(graft.log.ColRange("d",
      Some(Bound.Num(BigDecimal(days))), Some(Bound.Num(BigDecimal(days))))))
    val d2 = GwRuntimeFilterTranslation.toRanges(
      sources.GreaterThan("d", java.sql.Date.valueOf("1995-03-15")))
    assert(d2.size == 1 && d2.head.lower.contains(Bound.Num(BigDecimal(days))) &&
      d2.head.upper.isEmpty && d2.head.minStatsVersion == 0)
    // micros encoding; timestamp constraints trust only v2 (micros) stats
    val inst = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val t1 = GwRuntimeFilterTranslation.toRanges(sources.EqualTo("t", inst))
    assert(t1.size == 1 && t1.head.minStatsVersion == 2 &&
      t1.head.lower.contains(Bound.Num(BigDecimal(inst.getEpochSecond * 1000000L))))
    val t2 = GwRuntimeFilterTranslation.toRanges(sources.LessThan("t",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(t2.size == 1 && t2.head.minStatsVersion == 2 &&
      t2.head.upper.exists(_.isInstanceOf[Bound.Num]))
    // IN over dates keeps the per-member set and the [min, max] envelope
    val din = GwRuntimeFilterTranslation.toRanges(sources.In("d",
      Array[Any](java.sql.Date.valueOf("1995-03-17"), java.sql.Date.valueOf("1995-03-15"))))
    assert(din.size == 1 && din.head.anyOf.size == 2 &&
      din.head.lower.contains(Bound.Num(BigDecimal(days))))
  }

  test("broadcast join on a DATE key runtime-prunes the fact files") {
    val loc = Files.createTempDirectory("dfp-date").resolve("orders").toString
    // the fixture ships o_orderdate as TIMESTAMP: cast to a true DATE key
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    o.repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate")
      .write.format("gwdelta").save(loc)
    val total = GwTable.forPath(spark, loc).snapshot().files.size
    assert(total >= 6, s"expected >= 6 date-range files, got $total")
    // selective dim side: only the earliest dates — the most common star
    // schema shape (fact JOIN date_dim ON date_key). o_orderdate spans
    // 1995-01..2001-08 in the fixture, so the cut must be NON-EMPTY for
    // the test to mean anything
    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderdate").cast("date").as("dd")).distinct()
      .filter(col("dd") < lit("1995-07-01").cast("date"))
    assert(dim.count() > 0, "the dim cut must be non-empty")
    val fact = spark.read.format("gwdelta").load(loc)
    val joined = fact.join(dim, fact("o_orderdate") === dim("dd"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sp"))
    // collect() (NOT head()): head() executes a separate limit-plan
    // QueryExecution, leaving joined's own plan unexecuted — its scans
    // would never receive the runtime filter and the pins below would
    // inspect a plan that never ran
    val got = joined.collect().head
    assert(got.getLong(0) > 0, "the pruned join must still match rows")
    val expected = o.join(
        o.select(col("o_orderdate").cast("date").as("dd")).distinct()
          .filter(col("dd") < lit("1995-07-01").cast("date")),
        col("o_orderdate") === col("dd"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sp"))
      .head()
    assert(got == expected, s"date-key runtime pruning changed results: $got vs $expected")
    val scans = factScans(joined)
    assert(scans.nonEmpty, "no runtime-filtering fact scan in the executed plan")
    val (b, s) = scans.head
    assert(b.runtimeFilters.nonEmpty,
      "the planner must insert a dynamic-pruning filter on the date key")
    assert(s.plannedFiles.size < total,
      s"early-date keys must prune late-date files: planned " +
        s"${s.plannedFiles.size} of $total")
  }

  test("filterAttributes declares only columns that can prune") {
    import spark.implicits._
    // stats restricted to k: a runtime filter on v could never drop a
    // file, so v must NOT be declared (Spark would plan and execute a
    // dead build-side key collection for it); b is a bloom column and
    // stays filterable even though it harvests no min/max
    val loc = Files.createTempDirectory("dfp-attrs").resolve("t").toString
    graft.streaming.GwSink.append(
      Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("k", "v", "b"),
      loc, bootstrapProps = Map(
        "graft.stats.columns" -> "k",
        graft.log.Bloom.ColumnsProp -> "b"))
    val df = spark.read.format("gwdelta").load(loc).filter(col("k") > 0)
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case bs: BatchScanExec => bs.scan
    }.flatMap {
      case s: GwRuntimeFilteringScan => Some(s)
      case w: org.apache.spark.sql.graftbridge.GwDeltaScan =>
        w.innerScan match {
          case s: GwRuntimeFilteringScan => Some(s)
          case _ => None
        }
      case _ => None
    }
    assert(scan.isDefined, "expected a runtime-filtering scan")
    val attrs = scan.get.filterAttributes().map(_.describe()).toSet
    assert(attrs.contains("k"), s"stats column must be filterable: $attrs")
    assert(attrs.contains("b"), s"bloom column must be filterable: $attrs")
    assert(!attrs.contains("v"),
      s"a column with no stats, bloom, or partition role must not be declared: $attrs")
    // unrestricted tables keep every atomic output column filterable
    val loc2 = Files.createTempDirectory("dfp-attrs2").resolve("t").toString
    Seq((1L, "x")).toDF("k", "v").write.format("gwdelta").save(loc2)
    val df2 = spark.read.format("gwdelta").load(loc2)
    df2.collect()
    val scan2 = df2.queryExecution.executedPlan.collectFirst {
      case bs: BatchScanExec => bs.scan
    }.flatMap {
      case s: GwRuntimeFilteringScan => Some(s)
      case w: org.apache.spark.sql.graftbridge.GwDeltaScan =>
        w.innerScan match {
          case s: GwRuntimeFilteringScan => Some(s)
          case _ => None
        }
      case _ => None
    }
    assert(scan2.exists(_.filterAttributes().map(_.describe()).toSet == Set("k", "v")))
  }
}
