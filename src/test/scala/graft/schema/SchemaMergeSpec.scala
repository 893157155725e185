package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SchemaMergeSpec extends AnyFunSuite {
  import SchemaMerge._

  /** Deterministic property sampling (no scalatestplus bridge offline). */
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(g.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(t => f(t._1, t._2))
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(g1, g2, g3))(t => f(t._1, t._2, t._3))

  private val atomGen: Gen[DataType] = Gen.oneOf(
    StringType, IntegerType, LongType, DoubleType, BooleanType,
    TimestampType, NullType)

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) atomGen
    else Gen.frequency(
      5 -> atomGen,
      2 -> Gen.lzy(structGen(depth - 1).map(identity[DataType])),
      1 -> Gen.lzy(typeGen(depth - 1).map(ArrayType(_, containsNull = true))))

  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(0, 4)
    names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f"))
    types <- Gen.listOfN(n, typeGen(depth))
  } yield StructType(names.zip(types).map { case (nm, t) =>
    StructField(nm, t, nullable = true) }.toSeq)

  private val sGen = structGen(2)

  test("commutative up to field order") {
    forAll(sGen, sGen) { (a, b) =>
      assert(normalize(merge(a, b)) == normalize(merge(b, a)))
    }
  }

  test("associative") {
    forAll(sGen, sGen, sGen) { (a, b, c) =>
      assert(normalize(merge(merge(a, b), c)) == normalize(merge(a, merge(b, c))))
    }
  }

  test("idempotent") {
    forAll(sGen) { a => assert(merge(a, a) == a) }
  }

  test("empty struct is the unit") {
    forAll(sGen) { a =>
      assert(merge(a, StructType(Nil)) == a)
      assert(normalize(merge(StructType(Nil), a)) == normalize(a))
    }
  }

  test("numeric widening: int + double -> double (JSON numbers)") {
    val a = StructType(Seq(StructField("x", LongType)))
    val b = StructType(Seq(StructField("x", DoubleType)))
    assert(merge(a, b).head.dataType == DoubleType)
    assert(merge(b, a).head.dataType == DoubleType)
  }

  test("NullType is identity for a field") {
    val a = StructType(Seq(StructField("x", NullType)))
    val b = StructType(Seq(StructField("x", TimestampType)))
    assert(merge(a, b).head.dataType == TimestampType)
  }

  test("heterogeneous records widen to one schema (ref client_test.go:41-111)") {
    // rows {red,blue}, {red,orange}, {black} -> one table schema
    val r1 = StructType(Seq(StructField("red", StringType), StructField("blue", LongType)))
    val r2 = StructType(Seq(StructField("red", StringType), StructField("orange", DoubleType)))
    val r3 = StructType(Seq(StructField("black", BooleanType)))
    val m = mergeAll(Seq(r1, r2, r3))
    assert(m.fieldNames.toSet == Set("red", "blue", "orange", "black"))
    assert(m("blue").dataType == LongType)
  }

  test("nested struct merge is recursive") {
    val a = StructType(Seq(StructField("u",
      StructType(Seq(StructField("id", LongType))))))
    val b = StructType(Seq(StructField("u",
      StructType(Seq(StructField("id", DoubleType), StructField("name", StringType))))))
    val m = merge(a, b)
    val u = m("u").dataType.asInstanceOf[StructType]
    assert(u("id").dataType == DoubleType)
    assert(u("name").dataType == StringType)
  }

  test("array element merge") {
    val a = StructType(Seq(StructField("xs", ArrayType(LongType))))
    val b = StructType(Seq(StructField("xs", ArrayType(DoubleType))))
    assert(merge(a, b)("xs").dataType == ArrayType(DoubleType))
  }

  test("conflict: lenient widens to string, strict throws") {
    val a = StructType(Seq(StructField("x", StringType)))
    val b = StructType(Seq(StructField("x",
      StructType(Seq(StructField("y", LongType))))))
    assert(merge(a, b, lenient = true)("x").dataType == StringType)
    intercept[SchemaMerge.SchemaMergeConflict] { merge(a, b, lenient = false) }
  }

  test("pruneNullTypes drops null-only fields, empty structs, null arrays") {
    val s = StructType(Seq(
      StructField("keep", StringType),
      StructField("nil", NullType),
      StructField("emptyStruct", StructType(Seq(StructField("n", NullType)))),
      StructField("arrOfNull", ArrayType(NullType)),
      StructField("nested", StructType(Seq(
        StructField("ok", LongType), StructField("n", NullType))))))
    val p = pruneNullTypes(s)
    assert(p.fieldNames.toSeq == Seq("keep", "nested"))
    assert(p("nested").dataType == StructType(Seq(StructField("ok", LongType))))
  }

  test("subsumes: evolved schema subsumes the old one") {
    val old = StructType(Seq(StructField("a", LongType)))
    val neu = merge(old, StructType(Seq(StructField("b", StringType))))
    assert(subsumes(neu, old))
    assert(!subsumes(old, neu))
  }
}
