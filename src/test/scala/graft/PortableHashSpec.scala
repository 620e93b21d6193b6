package graft

import org.apache.spark.sql.functions._
import graft.expressions.{PortableHash, PortableHashExpressions}
import org.apache.spark.unsafe.types.UTF8String

/** The portable-hash CONTRACT: md5Lower62(s) must equal DuckDB 1.0's
  * `md5_number_lower(s) & 4611686018427387903` forever — every sketch
  * oracle (d3/d4/t6/q22/q30) hangs off this equality. The expected values
  * below were computed in DuckDB once and frozen; if this test fails, the
  * sketches still work but every sketch oracle silently diverges.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  private val knownAnswers = Seq(
    "" -> 4486421873861165289L,
    "a" -> 2388727949023626033L,
    "abc" -> 3638874587954910934L,
    "the quick brown fox" -> 2648554643959888472L,
    "über-ASCII ñ" -> 3575315740021483975L) // multi-byte UTF-8 path

  test("md5Lower62 matches DuckDB md5_number_lower & mask (frozen answers)") {
    knownAnswers.foreach { case (s, expect) =>
      assert(PortableHash.md5Lower62(UTF8String.fromString(s)) == expect,
        s"hash drifted for input '$s'")
    }
  }

  test("scalar and array expressions agree with the kernel function") {
    val strs = knownAnswers.map(_._1)
    val viaScalar = strs.toDF("s")
      .select(PortableHashExpressions.md5Hash62($"s")).as[Long].collect().toSeq
    assert(viaScalar == knownAnswers.map(_._2))
    val viaArray = Seq(strs).toDF("a")
      .select(PortableHashExpressions.md5HashArray62($"a", distinctSorted = false))
      .as[Seq[Long]].head()
    assert(viaArray == knownAnswers.map(_._2))
    // distinctSorted variant: ascending unique set of the same hashes
    val sortedDistinct = Seq(strs ++ strs).toDF("a")
      .select(PortableHashExpressions.md5HashArray62($"a", distinctSorted = true))
      .as[Seq[Long]].head()
    assert(sortedDistinct == knownAnswers.map(_._2).sorted)
  }

  test("byte-window hashing (winnowing fast path) equals substring hashing") {
    val s = "abcdefgh"
    val bytes = s.getBytes("UTF-8")
    (0 to 3).foreach { i =>
      assert(PortableHash.md5Lower62(bytes, i, 5) ==
        PortableHash.md5Lower62(UTF8String.fromString(s.substring(i, i + 5))))
    }
  }
}
