package graft

/** SQL registration of the custom expressions (FunctionRegistry path). */
class SqlRegistrationSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from spark.sql after registration") {
    GraftExtensions.register(spark)
    val jw = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").as[Double].head()
    jw shouldBe 0.9611 +- 0.0001

    val sig = spark.sql(
      "SELECT size(minhash_sig('hello world')) AS n").as[Int].head()
    sig shouldBe 64

    val sh = spark.sql(
      "SELECT simhash64('a b c') = simhash64('a b c') AS eq").as[Boolean].head()
    sh shouldBe true

    val cos = spark.sql(
      "SELECT cosine_sim(hash_embed('x y z'), hash_embed('x y z')) AS c")
      .as[Double].head()
    cos shouldBe 1.0 +- 1e-6
  }

  test("register() parses optional literal args like the extensions path") {
    GraftExtensions.register(spark)
    // k/numHashes/seed literals must be honored, not silently defaulted
    val n = spark.sql(
      "SELECT size(minhash_sig('hello world', 5, 32, 7)) AS n").as[Int].head()
    n shouldBe 32
    val differentSeed = spark.sql(
      """SELECT minhash_sig('hello world', 3, 16, 1) =
         minhash_sig('hello world', 3, 16, 2) AS eq""").as[Boolean].head()
    differentSeed shouldBe false
  }

  test("register() rejects excess arguments instead of ignoring them") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT jaro_winkler('a', 'b', 'c')").collect()
    }
    e.getMessage should include("arguments")
  }
}
