package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded adversarial `embeddings` fixture generator — the
  * vector-search arm of the differential fuzz gate. The synthetic
  * corpus is dense non-degenerate FLOAT[64]; these classes concentrate
  * what it never contains: all-zero vectors (norm 0 — every cosine is
  * an x/0), byte-identical vectors (all distances 0, ties through every
  * top-k), a constant dimension (zero per-dim variance under
  * standardization), single-member and single-class label structures
  * (silhouette's within-cluster mean is undefined), scaled one-hot axis
  * vectors (orthogonal — heavy distance ties), and empty/one/two-row
  * corpora.
  *
  * Determinism contract identical to [[FuzzFixtures]]. Dimension stays
  * 64 (the engine's PQ subspacing and hyperplane constants assume it);
  * components are k/1024 floats (exactly representable — cross-engine
  * float agreement is never down to generator noise).
  */
object FuzzEmbeddingsFixtures {

  /** Adversarial classes, one dimension of nastiness each. */
  val Classes: Seq[String] = Seq(
    "baseline",        // dense random vectors, 10 labels (control group)
    "empty",           // zero rows
    "one_row",         // a single vector
    "two_rows",        // one pair (every pairwise stat on n=2)
    "zero_vectors",    // ~a third of the vectors all-zero (norm 0)
    "identical_vectors", // every vector byte-identical
    "constant_dim",    // dimension 0 constant across all rows
    "single_label",    // every vector the same label
    "singleton_labels",// every label exactly one member
    "axis_vectors")    // scaled one-hot basis vectors (orthogonal ties)

  val Dim = 64

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false),
    StructField("label", IntegerType, nullable = false)))

  /** Deterministic rows for one (class, seed) fixture. */
  def rows(cls: String, seed: Long): Seq[Row] = {
    val r = new java.util.Random(seed * 8161L + cls.hashCode)
    def comp(): Float = (r.nextInt(2049) - 1024).toFloat / 1024.0f
    def vec(): Seq[Float] = Seq.fill(Dim)(comp())
    def zeros: Seq[Float] = Seq.fill(Dim)(0.0f)
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    var id = -1L
    def add(v: Seq[Float], label: Int): Unit = {
      id += 1
      buf += Row(id, v, label)
    }
    cls match {
      case "baseline" =>
        (1 to 60 + r.nextInt(40)).foreach(_ => add(vec(), r.nextInt(10)))
      case "empty" => ()
      case "one_row" => add(vec(), 3)
      case "two_rows" =>
        add(vec(), 0); add(vec(), 1)
      case "zero_vectors" =>
        (1 to 60).foreach { i =>
          add(if (i % 3 == 0) zeros else vec(), r.nextInt(6))
        }
      case "identical_vectors" =>
        val v = vec()
        (1 to 50).foreach(_ => add(v, r.nextInt(5)))
      case "constant_dim" =>
        (1 to 50).foreach { _ =>
          add(0.5f +: Seq.fill(Dim - 1)(comp()), r.nextInt(8))
        }
      case "single_label" =>
        (1 to 50).foreach(_ => add(vec(), 7))
      case "singleton_labels" =>
        (0 until 40).foreach(i => add(vec(), i))
      case "axis_vectors" =>
        (0 until 48).foreach { i =>
          val axis = i % Dim
          val scale = (1 + r.nextInt(8)).toFloat / 4.0f
          add(Seq.tabulate(Dim)(d => if (d == axis) scale else 0.0f),
            i % 6)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }
    buf.toSeq
  }

  /** Materialize one fixture as `<dir>/embeddings.parquet`. */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows(cls, seed).asJava, schema)
      .repartition(1) // one writer task → exactly one part file, even empty
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
