package graft

import graft.log.Bound
import org.apache.spark.sql.graftbridge.GwStatsPruning
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property-based invariants of the typed stats bounds that file skipping
 * relies on: `Bound.cmp` must order strings exactly like parquet's UTF-8
 * byte ordering (the stat order), numbers exactly (no Double rounding),
 * and `prefixSuccessor` must genuinely upper-bound every string with the
 * prefix — pruning that keeps too much is slow, pruning that keeps too
 * little is WRONG.
 */
object PruningPropertySpec extends Properties("graft.pruning") {

  // valid Unicode strings only (no unpaired surrogates): parquet stats are
  // well-formed UTF-8, and Java's UTF-8 encoder mangles lone surrogates
  private val genCodePoint: Gen[Int] = Gen.frequency(
    8 -> Gen.chooseNum(0x20, 0x7E),       // ASCII
    2 -> Gen.chooseNum(0x80, 0xD7FF),     // BMP below surrogates
    1 -> Gen.chooseNum(0xE000, 0xFFFD),   // BMP above surrogates
    1 -> Gen.chooseNum(0x10000, 0x10FFF)) // supplementary (surrogate pairs)
  private val genValidString: Gen[String] =
    Gen.listOfN(6, genCodePoint).map(_.flatMap(Character.toChars(_).toSeq).mkString)
  private val genNonEmpty: Gen[String] = genValidString.suchThat(_.nonEmpty)

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def byteCmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return Integer.signum(c)
      i += 1
    }
    Integer.signum(a.length - b.length)
  }

  property("string cmp == parquet's unsigned UTF-8 byte order") =
    forAll(genValidString, genValidString) { (a, b) =>
      Bound.cmp(Bound.Str(a), Bound.Str(b)).contains(byteCmp(utf8(a), utf8(b)))
    }

  property("numeric cmp is exact for int64 beyond 2^53") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (a, b) =>
      // adjacent huge longs that collapse under Double stay distinct
      Bound.cmp(Bound.Num(BigDecimal(a)), Bound.Num(BigDecimal(b)))
        .contains(java.lang.Long.compare(a, b)) &&
        Bound.cmp(Bound.Num(BigDecimal(Long.MaxValue)),
          Bound.Num(BigDecimal(Long.MaxValue - 1))).contains(1)
    }

  property("cross-kind cmp proves nothing (keeps the file)") =
    forAll(genValidString, Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (s, n) =>
      Bound.cmp(Bound.Str(s), Bound.Num(BigDecimal(n))).isEmpty &&
        Bound.cmp(Bound.Num(BigDecimal(n)), Bound.Str(s)).isEmpty
    }

  property("prefixSuccessor bounds every string with the prefix") =
    forAll(genNonEmpty, genValidString) { (prefix, suffix) =>
      val s = prefix + suffix
      val lowerOk = Bound.cmp(Bound.Str(s), Bound.Str(prefix)).exists(_ >= 0)
      val upperOk = GwStatsPruning.prefixSuccessor(prefix) match {
        case Some(up) => Bound.cmp(Bound.Str(s), Bound.Str(up)).exists(_ < 0)
        case None => true // unbounded above: nothing to violate
      }
      lowerOk && upperOk
    }

  property("IN-list per-member pruning keeps every file containing a member") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-50, 50), Gen.chooseNum(0, 30))),
      Gen.nonEmptyListOf(Gen.chooseNum(-60, 60))) { (ranges, members) =>
      import graft.log.{AddFile, ColRange, Snapshot}
      val files = ranges.zipWithIndex.map { case ((lo, w), i) =>
        AddFile(s"f$i", 1L, 1L, stats = Some(
          s"""{"minValues":{"k":$lo},"maxValues":{"k":${lo + w}}}"""))
      }
      val snap = Snapshot(0L, None, None, files)
      val bs = members.sorted.map(m => Bound.Num(BigDecimal(m)))
      val kept = snap.filesForRanges(Seq(
        ColRange("k", Some(bs.head), Some(bs.last), anyOf = bs)))
        .map(_.path).toSet
      // soundness: a file whose [mn, mx] contains ANY member must survive
      val mustKeep = ranges.zipWithIndex.collect {
        case ((lo, w), i) if members.exists(m => m >= lo && m <= lo + w) => s"f$i"
      }.toSet
      mustKeep.subsetOf(kept) && {
        // strength: a file provably missing EVERY member is pruned
        val mustPrune = ranges.zipWithIndex.collect {
          case ((lo, w), i) if !members.exists(m => m >= lo && m <= lo + w) => s"f$i"
        }.toSet
        mustPrune.intersect(kept).isEmpty
      }
    }

  property("prefixSuccessor survives surrogate-adjacent chars") = {
    // U+D7FF + 1 lands in the surrogate block; the successor must overshoot,
    // not emit an unpaired surrogate that UTF-8-encodes as '?'
    val p = "ab퟿"
    val up = GwStatsPruning.prefixSuccessor(p).get
    !up.exists(Character.isSurrogate) &&
      Bound.cmp(Bound.Str(p + "zzz"), Bound.Str(up)).contains(-1)
  }
}
