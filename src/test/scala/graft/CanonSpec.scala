package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Canon]] mirrors `tools/check.py`'s `norm()`/`sorted()` — Python
  * semantics, not Java's. These tests cross-check against a REAL python3
  * (present in this environment; the driver runs check.py with the same
  * interpreter family), so a divergence in rounding mode, repr
  * quote-switching, or sort order fails here instead of surfacing as a
  * confusing "type-rendering delta" NOTE in the driver's compare. */
class CanonSpec extends AnyFunSuite {

  private def python(script: String): String = {
    val pb = new ProcessBuilder("python3", "-c", script)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"python3 failed: $out")
    out.stripLineEnd
  }

  test("g9 matches python %.9g exactly, including half-even ties") {
    // hand-picked hazards: the 2^-13 half-up/half-even tie from the r12
    // advice, decade rollovers under rounding, both exponent-form edges
    // (exp < -4, exp >= 9), negative zero, exact integers
    val fixed = Seq(
      math.pow(2, -13), 0.0001220703125, 1.0, -1.0, 0.0, -0.0, 100.0,
      0.1, 1.0 / 3.0, 2.0 / 3.0, 999999999.6, 1e9 - 1, 1e9, 1e-4, 9.9999e-5,
      1e-5, 1.5e16, -2.5e-7, 123456789.5, 0.000123456789, 3.14159265358979,
      6.02214076e23, 1.380649e-23, Double.MinPositiveValue, Double.MaxValue,
      4.9999999949999995e-7, 1234567885.0, 1234567895.0)
    val rnd = new scala.util.Random(20260814)
    val random = Seq.fill(200)(
      java.lang.Double.longBitsToDouble(rnd.nextLong())).filter(d =>
      !d.isNaN && !d.isInfinite)
    val uniform = Seq.fill(100)((rnd.nextDouble() - 0.5) * 2000.0)
    val all = fixed ++ random ++ uniform
    // ship the exact bit patterns so python sees the identical doubles
    val bits = all.map(java.lang.Double.doubleToRawLongBits)
      .mkString("[", ",", "]")
    val got = python(
      s"""import struct
         |for b in $bits:
         |    v = struct.unpack('<d', struct.pack('<q', b))[0]
         |    print(f"{v:.9g}")""".stripMargin).split("\n")
    all.zip(got).foreach { case (d, want) =>
      assert(Canon.g9(d) == want,
        s"g9($d) = ${Canon.g9(d)} but python %.9g = $want " +
          s"(bits ${java.lang.Double.doubleToRawLongBits(d)})")
    }
  }

  test("norm on byte arrays matches python str(bytes), incl. quote switch") {
    val cases: Seq[Array[Byte]] = Seq(
      "plain".getBytes("UTF-8"),
      "it's".getBytes("UTF-8"),                 // ' and no " -> b"it's"
      "say \"hi\"".getBytes("UTF-8"),           // " and no ' -> single-quoted
      "both ' and \"".getBytes("UTF-8"),        // both -> single-quoted, \'
      Array[Byte](0, 1, 9, 10, 13, 27, 127, -1, -128),
      "back\\slash".getBytes("UTF-8"),
      Array.emptyByteArray)
    val hex = cases.map(_.map(b => f"${b & 0xff}%02x").mkString)
      .mkString("['", "','", "']")
    val got = python(
      s"""for h in $hex:
         |    print(str(bytes.fromhex(h)))""".stripMargin).split("\n", -1)
    cases.zip(got).foreach { case (b, want) =>
      assert(Canon.norm(b) == want,
        s"norm(${b.toSeq}) = ${Canon.norm(b)} but python str = $want")
    }
  }

  test("norm on struct rows matches python str(dict), incl. repr quote-switch") {
    import org.apache.spark.sql.types._
    def row(vals: Array[Any], fields: (String, DataType)*) =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        vals, StructType(fields.map { case (n, t) => StructField(n, t) }))
    val r1 = row(Array[Any]("it's", 7L),
      "a" -> StringType, "b" -> LongType)
    val r2 = row(Array[Any]("say \"hi\"\n\tnow", null),
      "x" -> StringType, "y" -> StringType)
    val want = python(
      """print(str({'a': "it's", 'b': 7}))
        |print(str({'x': 'say "hi"\n\tnow', 'y': None}))""".stripMargin)
      .split("\n")
    assert(Canon.norm(r1) == want(0), s"${Canon.norm(r1)} != ${want(0)}")
    assert(Canon.norm(r2) == want(1), s"${Canon.norm(r2)} != ${want(1)}")
  }

  test("digest row sort is python code-point order, not UTF-16 unit order") {
    // U+1F600 (astral, surrogate-coded 0xD83D 0xDE00) vs U+FF10
    // (fullwidth zero): python sorts by code point (0xFF10 < 0x1F600);
    // java code-unit order would invert them
    val astral = new String(Character.toChars(0x1F600))
    val bmp = "０"
    assert(Canon.cpCompare(bmp, astral) < 0, "code-point order expected")
    val want = python(
      s"""import hashlib
         |strs = sorted(['\\U0001F600', '\\uFF10', 'plain'])
         |print(hashlib.md5('\\x1e'.join(strs).encode('utf-8')).hexdigest())
         |""".stripMargin)
    assert(Canon.digest(Array(astral, bmp, "plain")) == want)
  }
}
