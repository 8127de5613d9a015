package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The r9 outage: the driver regenerated /root/testdata with events.ts at
  * a new physical type, 28 queries dropped out of the gate and 7 specs
  * went red — silently, since Verify swallows per-query failures. This
  * spec is the loud tripwire: it fails the build the moment any of the
  * ten harness tables drifts from the schema the engine expects, naming
  * the drifted column.
  */
class HarnessSchemaSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("all ten harness tables conform to the expected logical schema") {
    val drift = SchemaGuard.check(TestSpark.spark, sfDir)
    assert(drift.isEmpty, s"\nHARNESS SCHEMA DRIFT:\n  ${drift.mkString("\n  ")}")
  }

  test("diff names the drifted column when fed a wrong-typed table") {
    // events with ts as string — the shape of a harness regeneration gone odd
    val wrong = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val drift = SchemaGuard.diff("events", wrong)
    assert(drift.size == 1)
    assert(drift.head.contains("events.ts"))
    assert(drift.head.contains("arrived as string"))
  }

  test("diff flags missing and unexpected columns") {
    val mutated = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("extra_col", IntegerType)))
    val drift = SchemaGuard.diff("events", mutated)
    assert(drift.exists(d => d.contains("events.props") && d.contains("MISSING")))
    assert(drift.exists(d => d.contains("events.extra_col") && d.contains("UNEXPECTED")))
  }

  test("every historical ts encoding normalizes to TimestampType") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // nanos-as-long vintage
    val nanos = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    assert(Tables.normalizeEventsTs(nanos).schema("ts").dataType == TimestampType)
    // plain-micros NTZ vintage (current harness data), built via cast
    val ntz2 = Seq((1L, "2024-01-02T03:04:05.123456")).toDF("event_id", "s")
      .select($"event_id", $"s".cast(TimestampNTZType).as("ts"))
    assert(ntz2.schema("ts").dataType == TimestampNTZType)
    val normNtz = Tables.normalizeEventsTs(ntz2)
    assert(normNtz.schema("ts").dataType == TimestampType)
    // UTC session zone: the micros value must be preserved verbatim
    val micros = normNtz.select(unix_micros($"ts")).as[Long].head()
    assert(micros == 1704164645123456L)
    // already-TimestampType vintage: pass-through
    assert(Tables.normalizeEventsTs(normNtz).schema("ts").dataType == TimestampType)
    // nanos value agrees with the micros floor
    val nMicros = Tables.normalizeEventsTs(nanos).select(unix_micros($"ts")).as[Long].head()
    assert(nMicros == 1700000000123456L)
  }

  test("normalizeTs passes DATE through and rejects unrelated types") {
    import TestSpark.spark
    import spark.implicits._
    val dated = Seq((1L, "2024-01-02")).toDF("k", "d")
      .select($"k", $"d".cast(DateType).as("d"))
    assert(Tables.normalizeTs(dated, "d").schema("d").dataType == DateType)
    val stringy = Seq((1L, "x")).toDF("k", "d")
    val e = intercept[IllegalStateException](Tables.normalizeTs(stringy, "d"))
    assert(e.getMessage.contains("unsupported type"))
    // the events-specific wrapper refuses DATE loudly — time-of-day is
    // load-bearing there, and a silent midnight-zeroing would keep the
    // gate green over degenerate data
    val datedTs = dated.withColumnRenamed("d", "ts")
    val e2 = intercept[IllegalStateException](Tables.normalizeEventsTs(datedTs))
    assert(e2.getMessage.contains("DATE"))
  }
}
