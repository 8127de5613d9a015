package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.TestSpark
import org.apache.spark.sql.functions.col

class ZOrderSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def morton(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches a reference Morton interleave") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L), (7L, 8L))
    val df = pts.toDF("x", "y")
    val got = df.select(ZOrder.zValue(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    got shouldBe pts.map { case (x, y) => morton(x, y) }.toArray
    // sanity: full 16-bit corner hits 2^32 - 1
    morton(65535L, 65535L) shouldBe (1L << 32) - 1
  }

  test("z-order layout bounds BOTH dims; skipping beats the linear layout on 2-D predicates") {
    // uniform grid over both dimensions so clustering differences show
    val rnd = new scala.util.Random(11)
    val rows = (1 to 20000).map { _ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)
    }
    val df = rows.toDF("l_partkey", "l_suppkey")
    val out = ZOrder.zorderSkippingStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val z = out("zorder"); val l = out("linear")
    // both layouts produce full file counts over a uniform grid
    z.getAs[Long]("n_files") shouldBe 64L
    l.getAs[Long]("n_files") shouldBe 64L
    // the predicate covers 1/16 of x and 1/512 of y:
    // linear layout must read every file in the x-range (y unbounded per file);
    // zorder bounds y too, reading strictly fewer rows
    z.getAs[Long]("rows_in_read_files") should be < l.getAs[Long]("rows_in_read_files")
    // per-file y spans: zorder files cover a fraction of y; linear files ~all of it
    z.getAs[Long]("sum_y_span_read") should be < l.getAs[Long]("sum_y_span_read")
  }

  test("skipping is non-degenerate on small key domains (gate-SF shape)") {
    // sf0.01-shaped keys: partkey ≤ 2000, suppkey ≤ 100 — far below 2^16.
    // The data-derived scaling must still materialize the full 64-file
    // layout and the cell-aligned predicate must read SOME but not ALL
    // files in BOTH layouts, with zorder strictly cheaper.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { _ =>
      (rnd.nextInt(2000).toLong + 1L, rnd.nextInt(100).toLong + 1L)
    }
    val df = rows.toDF("l_partkey", "l_suppkey")
    val out = ZOrder.zorderSkippingStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val z = out("zorder"); val l = out("linear")
    z.getAs[Long]("n_files") shouldBe 64L
    l.getAs[Long]("n_files") shouldBe 64L
    for (r <- Seq(z, l)) {
      r.getAs[Long]("n_files_read") should be > 0L
      r.getAs[Long]("n_files_read") should be < r.getAs[Long]("n_files")
      r.getAs[Long]("rows_in_read_files") should be > 0L
    }
    z.getAs[Long]("n_files_read") should be < l.getAs[Long]("n_files_read")
    z.getAs[Long]("rows_in_read_files") should be < l.getAs[Long]("rows_in_read_files")
  }

  test("Hilbert index at 4 bits is a bijection with unit-step adjacency") {
    // exhaustive 16x16 grid: d must be a permutation of 0..255 and
    // consecutive d's must be Manhattan-adjacent cells — the defining
    // Hilbert property (Z-order fails adjacency at quadrant seams)
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = ZOrder.withHilbert(grid.toDF("x", "y"), "x", "y", "d", bits = 4)
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
    out.map(_._1).sorted.toSeq shouldBe (0L until 256L)
    val inv = out.toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = inv(d); val (x2, y2) = inv(d + 1)
      withClue(s"d=$d") { math.abs(x1 - x2) + math.abs(y1 - y2) shouldBe 1L }
    }
  }

  test("hilbert skipping stats: hilbert coalesces the seam-straddling read into fewer runs") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val rows = ZOrder.hilbertSkippingStats(li).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val h = rows("hilbert"); val z = rows("zorder")
    h.getAs[Long]("n_files") shouldBe 64L
    h.getAs[Long]("n_files_read") should be > 0L
    // min/max pruning reads the same file count under either curve at
    // this granularity; the Hilbert win is CONTIGUITY of the read set
    h.getAs[Long]("n_runs_read") should be <= z.getAs[Long]("n_runs_read")
  }
}
