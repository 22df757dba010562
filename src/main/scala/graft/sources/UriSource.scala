package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic URI scan (SURVEY.md §2.1 S3): one entry point for every
  * Hadoop-filesystem scheme Spark resolves — `file://`, `hdfs://`,
  * `s3a://`, `gs://`, `abfss://`. The reference reaches its remote
  * extracts through a bespoke Box client (`code/RCLIF_dialysis.Rmd:25-32`,
  * `RCLIF_disposition.Rmd:25-41`) and then reads the downloaded file; on
  * Spark the object store IS a filesystem URI, so "remote scan" collapses
  * into the ordinary reader with the scheme's connector jar + credentials
  * provided by the deployment (no code change, no local staging, splits
  * stream straight from the store).
  *
  * Scale note: object-store listings are expensive — prefer a coarse
  * `uri` glob over many fine ones, and partitioned layouts over flat
  * million-object prefixes so partition pruning replaces listing.
  *
  * == Credential recipe (the part a sandbox can't execute) ==
  * The scheme dispatch itself is proven offline two ways — the live
  * `http(s)://` server oracle (`s9_http_scan`) and UriSourceSpec's
  * custom-scheme registration — so a cloud scheme only needs its
  * connector jar on the classpath plus standard Hadoop conf, all
  * public documented surface:
  *  - s3a:// (hadoop-aws + aws-sdk-bundle):
  *    `spark.hadoop.fs.s3a.aws.credentials.provider` =
  *    `org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider`
  *    (instance roles; zero secrets in code) or
  *    `SimpleAWSCredentialsProvider` with
  *    `fs.s3a.access.key`/`fs.s3a.secret.key` from the deployment's
  *    secret store; private endpoints via `fs.s3a.endpoint`.
  *  - gs:// (gcs-connector): `fs.gs.auth.type=APPLICATION_DEFAULT`
  *    rides the node's service account;
  *    `fs.gs.auth.service.account.json.keyfile` for key files.
  *  - abfss:// (hadoop-azure): `fs.azure.account.auth.type=OAuth` +
  *    the `fs.azure.account.oauth2.client.{id,secret,endpoint}`
  *    triple.
  * All are plain `--conf spark.hadoop.*` settings — no engine code
  * path differs from the `file://`/`http://` ones exercised here.
  */
object UriSource {

  /** Read `format` data at `uri`. An explicit schema skips the inference
    * scan — on a 100 TB prefix, inference is a full extra listing+read
    * of sampled objects, so production paths should always pass one. */
  def read(spark: SparkSession, uri: String, format: String = "parquet",
           schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.fold(r)(r.schema).load(uri)
  }

  /** Delimited flavor with the CLIF extract defaults (header + '|'),
    * mirroring ClifEtl's local reads for remote extracts. */
  def delimited(spark: SparkSession, uri: String, delimiter: String = "|",
                schema: Option[StructType] = None): DataFrame =
    read(spark, uri, "csv", schema,
      Map("header" -> "true", "delimiter" -> delimiter) ++
        (if (schema.isEmpty) Map("inferSchema" -> "true") else Map.empty))
}
