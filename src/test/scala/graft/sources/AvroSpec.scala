package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro container-file interchange: typed roundtrip, nulls, nested
  * values, decode-level projection, and loud failures.
  */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_avro").toString + "/ds"

  test("roundtrip preserves the full supported type surface incl nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("arr", ArrayType(StringType, containsNull = true), nullable = true),
      StructField("nested", StructType(Seq(
        StructField("x", LongType, nullable = true),
        StructField("y", StringType, nullable = true))), nullable = true)))
    val rows = Seq(
      Row(1L, 7, 2.5, 1.5f, "héllo ☃", true, Array[Byte](1, 2, 3),
        Seq("a", null, "c"), Row(9L, "in")),
      Row(2L, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val p = tmp()
    Avro.writeAvro(df, p)
    val back = Avro.readAvro(spark, p).orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getLong(0) === 1L && back(0).getInt(1) === 7)
    assert(back(0).getDouble(2) === 2.5 && back(0).getFloat(3) === 1.5f)
    assert(back(0).getString(4) === "héllo ☃" && back(0).getBoolean(5))
    assert(back(0).getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, 3))
    assert(back(0).getSeq[String](7) === Seq("a", null, "c"))
    assert(back(0).getStruct(8) === Row(9L, "in"))
    assert((1 to 8).forall(back(1).isNullAt), back(1).toString)
    // read-back schema matches (names, types, nullability of sidecar)
    assert(Avro.sparkSchemaOf(spark, p).fieldNames.toSeq === schema.fieldNames.toSeq)
  }

  test("projection read returns only requested columns, values intact") {
    val df = (1L to 100L).map(i => (i, s"text$i", i * 10)).toDF("id", "t", "v")
    val p = tmp()
    Avro.writeAvro(df.repartition(4), p)
    val pruned = Avro.readAvro(spark, p, projection = Seq("v", "id"))
    assert(pruned.schema.fieldNames.toSeq === Seq("v", "id"))
    val got = pruned.orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === (1L to 100L).map(i => (i * 10, i)))
    // one task per container file
    assert(pruned.rdd.getNumPartitions === 4)
  }

  test("empty dataset roundtrips via the schema sidecar") {
    val df = Seq.empty[(Long, String)].toDF("id", "t")
    val p = tmp()
    Avro.writeAvro(df, p)
    val back = Avro.readAvro(spark, p)
    assert(back.count() === 0L)
    assert(back.schema.fieldNames.toSeq === Seq("id", "t"))
  }

  test("schema evolution: added fields fill from defaults, reorder/drop work") {
    val p = tmp()
    Avro.writeAvro((1L to 50L).map(i => (i, s"t$i")).toDF("id", "t")
      .repartition(3), p)
    val evolved = StructType(Seq(
      StructField("weight", LongType, nullable = false),   // added, default
      StructField("id", LongType, nullable = true),        // reordered
      StructField("tier", StringType, nullable = true),    // added, default
      StructField("note", StringType, nullable = true)))   // added, null default
    val back = Avro.readAvroAs(spark, p, evolved,
        Map("weight" -> 7L, "tier" -> "unscored", "note" -> null))
      .orderBy("id").collect()
    assert(back.length === 50)
    assert(back.forall(r => r.getLong(0) === 7L && r.getString(2) === "unscored"
      && r.isNullAt(3)))
    assert(back.map(_.getLong(1)).toSeq === (1L to 50L))
    // 't' was dropped by the evolved schema (projection by omission)
    assert(back.head.length === 4)
    // missing field WITHOUT a default fails before any task runs
    val e = intercept[IllegalArgumentException] {
      Avro.readAvroAs(spark, p, StructType(Seq(
        StructField("id", LongType, nullable = true),
        StructField("ghost", LongType, nullable = true))))
    }
    assert(e.getMessage.contains("no default"), e.getMessage)
  }

  test("unsupported types and unknown projection columns fail loudly") {
    val p = tmp()
    val e1 = intercept[IllegalArgumentException] {
      Avro.writeAvro(Seq((1L, java.sql.Date.valueOf("2020-01-01")))
        .toDF("id", "d"), p)
    }
    assert(e1.getMessage.contains("does not support"), e1.getMessage)
    Avro.writeAvro(Seq((1L, "x")).toDF("id", "t"), p)
    val e2 = intercept[IllegalArgumentException] {
      Avro.readAvro(spark, p, projection = Seq("nope"))
    }
    assert(e2.getMessage.contains("not in Avro schema"), e2.getMessage)
  }
}
