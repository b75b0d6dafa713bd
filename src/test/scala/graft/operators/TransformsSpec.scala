package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TransformsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typecast single column to long") {
    val df = Seq(("1", 2.0), ("3", 4.5)).toDF("a", "b")
    val out = Transforms.typecast("a", "int")(df)
    assert(out.schema("a").dataType == LongType)
    assert(out.select("a").as[Long].collect().sorted.sameElements(Array(1L, 3L)))
  }

  test("typecast * casts every column") {
    val df = Seq((1, 2L)).toDF("a", "b")
    val out = Transforms.typecast("*", "string")(df)
    assert(out.schema.fields.forall(_.dataType == StringType))
  }

  test("typecast rejects unknown target") {
    intercept[IllegalArgumentException] {
      Transforms.typecast("a", "bogus")(Seq(1).toDF("a"))
    }
  }

  test("tagging appends constant column; collision is a no-op") {
    val df = Seq(1, 2).toDF("x")
    val out = Transforms.tagging("tag", "hello")(df)
    assert(out.select("tag").as[String].collect().forall(_ == "hello"))
    val collided = Transforms.tagging("x", "boom")(df)
    assert(collided.schema("x").dataType == IntegerType) // untouched
  }

  test("originRegex rewrites the origin column (replace-all)") {
    val df = Seq(("a_src_src", 1)).toDF("origin", "v")
    val out = Transforms.originRegex("src", "dst")(df)
    assert(out.select("origin").as[String].head() == "a_dst_dst")
  }

  test("toCsv then fromCsv round-trips values as strings") {
    val df = Seq((1, "alpha"), (2, "beta")).toDF("id", "name")
    val csv = Transforms.toCsv(df)
    assert(csv.columns.toSeq == Seq("origin", "value"))
    val back = Transforms.fromCsv(Seq("id", "name"))(csv)
    val rows = back.select("id", "name").as[(String, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("1", "alpha"), ("2", "beta")))
  }

  test("fromCsv drops header lines and handles multi-line binary payloads") {
    val payload = "id,name\n1,alpha\n2,beta"
    val df = Seq(("f.csv", payload.getBytes("UTF-8"))).toDF("origin", "value")
    val out = Transforms.fromCsv(Seq("id", "name"))(df)
    assert(out.count() == 2)
  }

  test("stub drains everything") {
    assert(Transforms.stub(Seq(1, 2, 3).toDF("x")).count() == 0)
  }

  test("execPipe pipes rows through an external process") {
    val out = Transforms.execPipe(Seq("cat"))(Seq("a", "b").toDF("v"))
    assert(out.as[String].collect().sorted.sameElements(Array("a", "b")))
  }

  test("execPipe rejects multi-column frames (bin mode is single-payload)") {
    intercept[IllegalArgumentException] {
      Transforms.execPipe(Seq("cat"))(Seq((1, "a")).toDF("id", "v"))
    }
  }

  test("execDf expands rows to --col=val args and passes the frame through") {
    val dir = java.nio.file.Files.createTempDirectory("execdf")
    val log = dir.resolve("log.txt")
    val script = dir.resolve("rec.sh")
    java.nio.file.Files.writeString(script,
      s"#!/bin/sh\necho \"$$@\" >> $log\n")
    script.toFile.setExecutable(true)
    val df = Seq((1, "a"), (2, null: String)).toDF("id", "name").coalesce(1)
    val out = Transforms.execDf(Seq(script.toString))(df)
    val rows = out.collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1, "a"), (2, null)))  // pass-through, schema intact
    val logged = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(log)).asScala.sorted
    assert(logged == Seq("--id=1 --name=a", "--id=2 --name="))
  }

  test("execDf fails the task on nonzero exit (at-least-once error path)") {
    val e = intercept[org.apache.spark.SparkException] {
      Transforms.execDf(Seq("false"))(Seq(1).toDF("x")).collect()
    }
    assert(e.getMessage.contains("exited") || e.getCause != null)
  }

  test("execBin round-trips raw bytes (newlines, 0x00, invalid UTF-8) through cat") {
    // line-oriented transports mangle every one of these payloads
    val payloads: Seq[Array[Byte]] = Seq(
      "line1\nline2\n".getBytes("UTF-8"),
      Array[Byte](0, 1, 2, 0, -1, 10, 13, 0),
      Array[Byte](-2, -1, -40, -1), // invalid UTF-8 lead bytes
      Array.emptyByteArray)
    val df = payloads.zipWithIndex
      .map { case (b, i) => (s"p$i", b) }.toDF("origin", "value")
    val out = Transforms.execBin(Seq("cat"))(df)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    payloads.zipWithIndex.foreach { case (b, i) =>
      assert(java.util.Arrays.equals(out(s"p$i"), b),
        s"payload p$i corrupted in transit")
    }
  }

  test("execBin emits the child's stdout as the new payload, origin preserved") {
    val df = Seq(("src_a", "hello world".getBytes("UTF-8"))).toDF("origin", "value")
    val out = Transforms.execBin(Seq("tr", "a-z", "A-Z"))(df).collect()
    assert(out.head.getString(0) == "src_a")
    assert(new String(out.head.getAs[Array[Byte]](1), "UTF-8") == "HELLO WORLD")
  }

  test("execBin passes the env map to the child (reference env config parity)") {
    val dir = java.nio.file.Files.createTempDirectory("execenv")
    val script = dir.resolve("env.sh")
    java.nio.file.Files.writeString(script,
      "#!/bin/sh\nprintf '%s' \"$GRAFT_MARKER\"\n")
    script.toFile.setExecutable(true)
    val df = Seq(("o", Array.emptyByteArray)).toDF("origin", "value")
    val out = Transforms.execBin(Seq(script.toString),
      env = Map("GRAFT_MARKER" -> "mark-42"))(df).collect()
    assert(new String(out.head.getAs[Array[Byte]](1), "UTF-8") == "mark-42")
  }

  test("parseEnv follows the reference's comma-separated K=V form") {
    assert(Transforms.parseEnv("A=1, B=x=y ,C,") ==
      Map("A" -> "1", "B" -> "x=y", "C" -> ""))
    assert(Transforms.parseEnv("") == Map.empty[String, String])
  }

  test("execBin kills the child and fails the task on timeout") {
    val df = Seq(("o", Array.emptyByteArray)).toDF("origin", "value")
    val t0 = System.nanoTime()
    val e = intercept[org.apache.spark.SparkException] {
      Transforms.execBin(Seq("sleep", "30"), timeoutMs = 500)(df).collect()
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(elapsedMs < 15000, s"timeout did not fire promptly ($elapsedMs ms)")
    assert(e.getMessage.contains("timed out") ||
      Option(e.getCause).exists(_.getMessage.contains("timed out")))
  }

  test("sql section runs against the input view") {
    val df = Seq((1, "x"), (2, "y")).toDF("id", "s")
    val out = Transforms.sql("SELECT count(*) AS n FROM input")(df)
    assert(out.as[Long].head() == 2L)
  }

  test("dedupExact keeps one row per key") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    assert(Transforms.dedupExact(Seq("k"))(df).count() == 2)
  }

  test("dedupExact with tie-break keeps the deterministic minimum") {
    val df = Seq((1, "b"), (1, "a"), (2, "c"), (2, "a")).toDF("k", "v")
    val kept = Transforms.dedupExact(Seq("k"), tieBreak = Seq("v"))(df)
      .as[(Int, String)].collect().sortBy(_._1)
    assert(kept.toSeq == Seq((1, "a"), (2, "a")))
  }

  test("fromCsv keeps a data row identical to the header (positional drop only)") {
    // "id,name" appears both as the pos-0 header AND as a legitimate record
    val payload = "id,name\n1,alpha\nid,name\n2,beta"
    val df = Seq(("f.csv", payload.getBytes("UTF-8"))).toDF("origin", "value")
    val out = Transforms.fromCsv(Seq("id", "name"))(df)
      .select("id", "name").as[(String, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("1", "alpha"), ("2", "beta"), ("id", "name")))
  }

  test("fromCsv handles quoted fields with embedded commas") {
    val payload = "id,name\n1,\"alpha, the first\"\n2,plain"
    val df = Seq(("f.csv", payload.getBytes("UTF-8"))).toDF("origin", "value")
    val out = Transforms.fromCsv(Seq("id", "name"))(df)
      .select("id", "name").as[(String, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("1", "alpha, the first"), ("2", "plain")))
  }
}
