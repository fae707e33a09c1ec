package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Portable}

/** The timed path must carry its own correctness evidence (round-3 advice):
  * Bench measures the PRODUCTION near-dup variants (xxhash kernels) under the
  * same names whose oracle rows Verify earns with the md5 portable twins.
  * This spec closes the gap for g02/g04 by asserting the two families —
  * different hash kernels, same dataflow and the same EXACT verification —
  * produce identical final (doc_id, dup_of) clusters on the driver's real
  * sf0.01 documents table. (g03/g11 twins differ semantically — 60- vs
  * 64-bit simhash, axis- vs hashed-plane buckets on different inputs — and
  * stay pinned by DedupSpec's planted-duplicate agreement instead.) */
class ProdTwinAgreementSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

  private def docs() = spark.read.parquet(s"$sfDir/documents.parquet")

  override def withFixture(test: NoArgTest) = {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet")), s"no $sfDir")
    super.withFixture(test)
  }

  test("g02: production minhash near-dup == md5 twin on sf0.01 documents") {
    val prod = Dedup.minhashNearDup(spark, docs())
      .as[(Long, Long)].collect().toSet
    val twin = Portable.nearDupMd5(spark, docs(), "doc_id",
        Dedup.charShingles(lower(col("text")), 5), threshold = 0.8)
      .as[(Long, Long)].collect().toSet
    prod shouldBe twin
  }

  test("g04: production ngram near-dup == md5 twin on sf0.01 documents") {
    val prod = Dedup.ngramJaccardNearDup(spark, docs())
      .as[(Long, Long)].collect().toSet
    val twin = Portable.nearDupMd5(spark, docs(), "doc_id",
        Portable.wordNgramSet(col("text"), 3), threshold = 0.7)
      .as[(Long, Long)].collect().toSet
    prod shouldBe twin
  }

  test("g16: incremental minhash near-dup twin == full-batch twin on sf0.01") {
    // the g16 contract: attaching the deterministic ~25% delta slice to the
    // ~75% base dedup state reproduces the from-scratch dedup exactly (the
    // DuckDB oracle replays the batch SQL; this is the engine-side pin)
    val batch = Portable.nearDupMd5(spark, docs(), "doc_id",
        Dedup.charShingles(lower(col("text")), 5), threshold = 0.8)
      .as[(Long, Long)].collect().toSet
    val incr = Portable.nearDupMd5Incremental(spark, docs(), "doc_id",
        Dedup.charShingles(lower(col("text")), 5), threshold = 0.8)
      .as[(Long, Long)].collect().toSet
    incr shouldBe batch
  }

  test("g17: detach twin == full-batch twin over the remaining corpus") {
    // the g17 contract: detaching the deterministic ~25% md5 slice from the
    // full-table base state reproduces a from-scratch dedup of the
    // remaining ~75% exactly (the DuckDB oracle replays the batch SQL over
    // the filtered corpus; this is the engine-side pin)
    val remaining = docs().filter(
      !substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("c", "d", "e", "f"))
    val batch = Portable.nearDupMd5(spark, remaining, "doc_id",
        Dedup.charShingles(lower(col("text")), 5), threshold = 0.8)
      .as[(Long, Long)].collect().toSet
    val det = Portable.nearDupMd5Detach(spark, docs(), "doc_id",
        Dedup.charShingles(lower(col("text")), 5), threshold = 0.8)
      .as[(Long, Long)].collect().toSet
    det shouldBe batch
  }
}
