package graft

import graft.operators.Triangles

/** Triangle summary on planted graphs: known counts, normalization
  * (self-loops, reverse/parallel edges), and hub behavior.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(edges: Seq[(Long, Long)]) =
    Triangles.summary(edges.toDF("src", "dst"), "src", "dst")
      .first()

  test("K4 has 4 triangles and gcc 1.0") {
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    val r = summarize(k4)
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_tri") == 4)
    assert(r.getAs[Double]("gcc") == 1.0)
  }

  test("self-loops, reversed and parallel edges collapse") {
    val messy = Seq(
      (0L, 1L), (1L, 0L), (0L, 1L), // one edge
      (1L, 2L), (2L, 0L),
      (2L, 2L))                     // self-loop dropped
    val r = summarize(messy)
    assert(r.getAs[Long]("n_nodes") == 3)
    assert(r.getAs[Long]("n_edges") == 3)
    assert(r.getAs[Long]("n_tri") == 1)
  }

  test("star graph has zero triangles and zero gcc") {
    val star = (1L to 10L).map(i => (0L, i))
    val r = summarize(star)
    assert(r.getAs[Long]("n_tri") == 0)
    assert(r.getAs[Double]("gcc") == 0.0)
  }

  test("triangle + pendant path: count 1, wedges from both") {
    // triangle 0-1-2 plus path 2-3-4
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
    val r = summarize(g)
    assert(r.getAs[Long]("n_tri") == 1)
    // deg: 0:2 1:2 2:3 3:2 4:1 -> wedges 1+1+3+1+0 = 6; gcc = 3/6
    assert(r.getAs[Double]("gcc") == 0.5)
  }
}
