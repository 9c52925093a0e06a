package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sstable.{AegCell, AegJsonCodec, AegRow}

/** Codec round-trip property tests (SURVEY §5 pillar 2, mirroring
  * AegisthusSerializerTest): serialize ∘ parse == identity on rows
  * with live/deleted/expiring/counter cells and escape-needing names. */
class AegJsonCodecSpec extends AnyFunSuite {

  private val hexStr = Gen.listOf(Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
  private val anyStr = Gen.oneOf(hexStr,
    Gen.alphaNumStr, Gen.const("a\\b\"c\td"), Gen.const("ctrl"))

  private val cellGen: Gen[AegCell] = for {
    name <- anyStr
    value <- hexStr
    ts <- Gen.chooseNum(0L, Long.MaxValue / 2)
    kind <- Gen.oneOf("live", "d", "e", "c")
  } yield kind match {
    case "live" => AegCell(name, value, ts, None, None, None, None)
    case "d" => AegCell(name, value, ts, Some("d"), None, None, None)
    case "e" => AegCell(name, value, ts, Some("e"), Some(3600L), Some(1234567L), None)
    case "c" => AegCell(name, value, ts, Some("c"), None, None, Some(ts - 1))
  }

  private val rowGen: Gen[AegRow] = for {
    key <- Gen.nonEmptyListOf(Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    deletedAt <- Gen.oneOf(Gen.const(Long.MinValue), Gen.chooseNum(0L, Long.MaxValue / 2))
    cells <- Gen.listOf(cellGen)
  } yield AegRow(key, deletedAt, cells)

  test("serialize . parse == identity (500 generated rows)") {
    val rows = Gen.listOfN(500, rowGen)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator failed"))
    rows.foreach { row =>
      assert(AegJsonCodec.parse(AegJsonCodec.serialize(row)) == row, s"row: $row")
    }
  }

  test("parse handles the reference serializer's fixture shapes") {
    // shapes from AegisthusSerializerTest.java:43-48 (expiring, counter, escapes)
    val lines = Seq(
      "6b6579\t{\"6b6579\":{\"deletedAt\":-9223372036854775808,\"columns\":[[\"name\",\"76616c7565\",1234567890]]}}",
      "6b6579\t{\"6b6579\":{\"deletedAt\":-9223372036854775808,\"columns\":[[\"name\",\"76616c7565\",1234567890,\"e\",3600,1234568]]}}",
      "6b6579\t{\"6b6579\":{\"deletedAt\":-9223372036854775808,\"columns\":[[\"name\",\"76616c7565\",1234567890,\"c\",1234500000]]}}",
      "6b6579\t{\"6b6579\":{\"deletedAt\":-9223372036854775808,\"columns\":[[\"na\\\"me\",\"76616c7565\",1234567890,\"d\"]]}}")
    lines.foreach { l =>
      val row = AegJsonCodec.parse(l)
      assert(AegJsonCodec.serialize(row) == l)
    }
  }

  test("cleanse drops tombstoned and row-shadowed columns") {
    val row = AegRow("6b6579", 100L, Seq(
      AegCell("a", "01", 50L, None, None, None, None),      // shadowed: ts < deletedAt
      AegCell("b", "02", 150L, None, None, None, None),     // survives
      AegCell("c", "03", 200L, Some("d"), None, None, None) // tombstone
    ))
    assert(AegJsonCodec.cleanse(row).columns.map(_.name) == Seq("b"))
  }
}
