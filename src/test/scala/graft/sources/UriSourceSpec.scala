package graft.sources

import graft.SparkSpec

/** URI-scheme reader smoke: `file://` proves the scheme-dispatch path the
  * object-store schemes (s3a://, gs://) share — same reader, connector
  * jar + credentials are deployment concerns. */
class UriSourceSpec extends SparkSpec {

  test("explicit file:// URI parquet read with schema (no inference scan)") {
    val df = UriSource.read(spark,
      "file:///root/testdata/sf0.001/region.parquet")
    assert(df.count() == 5)
    val schema = df.schema
    val again = UriSource.read(spark,
      "file:///root/testdata/sf0.001/region.parquet",
      schema = Some(schema))
    assert(again.count() == 5 && again.schema == schema)
  }

  test("delimited flavor matches ClifEtl read defaults over a URI") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_uri")
    val f = tmp.resolve("x.txt")
    java.nio.file.Files.writeString(f, "a|b\n1|one\n2|two")
    val df = UriSource.delimited(spark, "file://" + f.toString)
    assert(df.count() == 2 && df.columns.toSeq == Seq("a", "b"))
  }
}
