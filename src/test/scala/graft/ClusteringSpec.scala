package graft

import org.apache.spark.sql.functions._

import graft.ops.Clustering

/** CC unit graphs per SURVEY.md §5.2: chain, star, two components,
  * self-loop; label = min node of the component (property). */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(String, String)]): Map[String, String] = {
    val df = edges.toDF("u", "v")
    Clustering.connectedComponents(spark, df)
      .as[(String, String)].collect().toMap
  }

  test("two components") {
    val m = cc(Seq(("a", "b"), ("b", "c"), ("x", "y")))
    m("b") shouldBe "a"
    m("c") shouldBe "a"
    m("y") shouldBe "x"
    m.get("a").foreach(_ shouldBe "a") // root may or may not self-report
  }

  test("long chain converges (log-round large/small star)") {
    val n = 64
    val chain = (0 until n - 1).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val m = cc(chain)
    (1 until n).foreach { i => m(f"n$i%03d") shouldBe "n000" }
  }

  test("star graph") {
    val m = cc((1 to 10).map(i => ("hub", f"leaf$i%02d")))
    // min node is "hub" lexicographically < "leafXX"
    (1 to 10).foreach { i => m(f"leaf$i%02d") shouldBe "hub" }
  }

  test("self loops and duplicate edges are harmless") {
    val m = cc(Seq(("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")))
    m("b") shouldBe "a"
  }

  test("property: every node's label is the component minimum") {
    // random graph, seeded; compare against a driver-side union-find oracle
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 60).map(i => f"v$i%02d")
    val edges = (0 until 80).map { _ =>
      (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size)))
    }.filter { case (a, b) => a != b }
    // oracle union-find
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: String): String = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.Ordering[String].max(ra, rb)) = math.Ordering[String].min(ra, rb)
    }
    val expected = nodes.map(n => n -> find(n)).toMap
    val m = cc(edges)
    edges.flatMap(e => Seq(e._1, e._2)).distinct.foreach { n =>
      m.getOrElse(n, n) shouldBe expected(n)
    }
  }

  test("non-convergence within maxIter throws instead of returning partial clusters") {
    val chain = (0 until 40).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val e = intercept[IllegalStateException] {
      Clustering.connectedComponents(spark, chain.toDF("u", "v"), maxIter = 1)
        .collect()
    }
    e.getMessage should include("did not converge")
  }

  test("roundsPerCut=1 and =3 produce identical clusterings") {
    val rnd = new scala.util.Random(11)
    val nodes = (0 until 40).map(i => f"w$i%02d")
    val edges = (0 until 50).map { _ =>
      (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size)))
    }.filter { case (a, b) => a != b }
    val df = edges.toDF("u", "v")
    val m1 = Clustering.connectedComponents(spark, df, roundsPerCut = 1)
      .as[(String, String)].collect().toMap
    val m3 = Clustering.connectedComponents(spark, df, roundsPerCut = 3)
      .as[(String, String)].collect().toMap
    val covered = edges.flatMap(e => Seq(e._1, e._2)).distinct
    covered.foreach { n => m1.getOrElse(n, n) shouldBe m3.getOrElse(n, n) }
  }

  test("clusters() assigns isolated nodes to themselves") {
    val matches = Seq(("a", "b", true), ("c", "d", false))
      .toDF("url_a", "url_b", "is_match")
    val nodes = Seq("a", "b", "c", "d", "e").toDF("url")
    val m = Clustering.clusters(spark, matches, nodes)
      .as[(String, String)].collect().toMap
    m("a") shouldBe "a"
    m("b") shouldBe "a"
    m("c") shouldBe "c"
    m("d") shouldBe "d"
    m("e") shouldBe "e"
  }
}
