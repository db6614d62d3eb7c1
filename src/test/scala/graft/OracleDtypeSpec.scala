package graft

import java.nio.file.{Files, Paths}

import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Oracle dtype guard (r6 verdict directive): execute EVERY registered
 * oracle in DuckDB against sf0.001 and assert (a) it parses and runs,
 * (b) no result column is HUGEINT or DECIMAL(>18) — the silent
 * SUM(BIGINT)→HUGEINT widening whose value hash diverges from Spark's
 * int64 dump. This exact bug shipped three rounds running
 * (sim_class_centroids r4, text_heavy_hitters r5, three gates r6); the
 * spec makes the class impossible to ship again.
 *
 * DuckDB lives on the verification-harness side only (python3), never on
 * the library classpath — the spec shells out to
 * tools/oracle_dtype_check.py and is cancelled (not failed) on machines
 * without python3+duckdb or the test data.
 */
class OracleDtypeSpec extends AnyFunSuite {

  test("every oracle runs in DuckDB and emits no HUGEINT/DECIMAL128 column") {
    val devNull = ProcessLogger(_ => (), _ => ())
    val haveDuck =
      try Process(Seq("python3", "-c", "import duckdb")).!(devNull) == 0
      catch { case _: Throwable => false }
    assume(haveDuck, "python3 with duckdb not available")
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"$sf missing")
    val script = Paths.get("tools/oracle_dtype_check.py").toAbsolutePath
    assume(Files.exists(script), s"$script missing")

    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(tmp, Verify.oracleJson())
    val out = new StringBuilder
    val log = ProcessLogger(l => out.append(l).append('\n'),
      l => out.append(l).append('\n'))
    val code = Process(
      Seq("python3", script.toString, sf, tmp.toString)).!(log)
    Files.deleteIfExists(tmp)
    assert(code == 0,
      s"oracle dtype guard failed:\n${out.toString.linesIterator
        .filter(_.startsWith("FAIL")).mkString("\n")}")
  }
}
