package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

class DelimitedSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("v", DoubleType)))

  private def write(name: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory(name)
    java.nio.file.Files.write(dir.resolve("part-0.txt"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    dir.toString
  }

  test("csv: clean rows parse, malformed rows quarantine (no silent loss)") {
    val p = write("csvsrc", Seq(
      "id,name,v",
      "1,alpha,1.5",
      "not_a_long,beta,2.5",
      "3,gamma,3.5"))
    val (clean, corrupt) = DelimitedSource.quarantine(
      DelimitedSource.csv(spark, p, schema))
    assert(clean.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "alpha", 1.5), (3L, "gamma", 3.5)))
    assert(corrupt.as[String].collect().toSeq === Seq("not_a_long,beta,2.5"))
  }

  test("jsonl: corrupt line quarantined with the raw text") {
    val p = write("jsonlsrc", Seq(
      """{"id": 1, "name": "alpha", "v": 1.5}""",
      """{"id": broken""",
      """{"id": 2, "name": "beta", "v": 2.5}"""))
    val (clean, corrupt) = DelimitedSource.quarantine(
      DelimitedSource.jsonl(spark, p, schema))
    assert(clean.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)))
    assert(corrupt.as[String].collect().toSeq === Seq("""{"id": broken"""))
  }
}
