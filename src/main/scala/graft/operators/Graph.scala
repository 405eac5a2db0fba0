package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import scala.reflect.ClassTag

/** Distributed connected components over an edge list — the shared kernel
  * behind [[graft.models.BlockedVar]]'s coupling-graph decomposition and the
  * corpus facade's keep-one-per-cluster near-dup dedup (a 100 TB curation
  * pipeline drops all-but-one of each near-duplicate CLUSTER, not of each
  * pair).
  *
  * Algorithm: min-label propagation with pointer jumping. Every vertex
  * starts labeled with itself; each round a vertex takes the least label
  * among itself and its neighbors, then shortcuts through its label's own
  * label (comp ← comp(comp)). Propagation alone needs O(diameter) rounds
  * (GraphX's built-in CC is exactly that — fatal on chain-shaped near-dup
  * clusters); the jump halves remaining label-chain depth each round, so
  * this converges in O(log diameter) rounds. Labels only ever decrease, so
  * the fixed point labels every vertex with the LEAST id in its component —
  * deterministic, no post-normalization.
  *
  * The loop is the one place in the engine that runs on RDDs by design: an
  * iterative fixed-point over slim id pairs re-plans, re-codegens, and
  * re-broadcasts under the DataFrame optimizer EVERY round (~1 s/round
  * measured, regardless of data size), while co-partitioned RDD joins make
  * each round a narrow pass over a handful of sized partitions — the same
  * reason GraphX's Pregel is RDD-based. Ids keep their native type
  * end-to-end (RDD joins key on any hashable type), so there is no
  * vertex-reindexing pass.
  */
object Graph {

  /** (id, comp) for every vertex appearing in `edges`; comp = least vertex
    * id in the component under the id type's natural ordering. Self-loops
    * are ignored: vertices touching no real edge are absent, so callers
    * default them to their own singleton. Supported id types: string, long,
    * int (both columns must match). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .localCheckpoint(true)
    val idType = e.schema("a").dataType
    require(e.schema("b").dataType == idType,
      s"edge endpoint types differ: $idType vs ${e.schema("b").dataType}")
    // size the loop's partitioner to the EDGE count, not the session shuffle
    // width: every round launches a task per partition, so a fixture-sized
    // graph on 32 partitions pays 32× the scheduling for empty work, while
    // ~1M-edge partitions keep 100 TB-scale graphs wide enough
    val nEdges = e.count()
    val nPart = math.min(4096L, math.max(1L, nEdges / 1000000L + 1L)).toInt
    val labels = idType match {
      case StringType =>
        ccLoop[String](e.rdd.map(r => (r.getString(0), r.getString(1))), nPart, maxIter)
          .map { case (v, c) => Row(v, c) }
      case LongType =>
        ccLoop[Long](e.rdd.map(r => (r.getLong(0), r.getLong(1))), nPart, maxIter)
          .map { case (v, c) => Row(v, c) }
      case IntegerType =>
        ccLoop[Int](e.rdd.map(r => (r.getInt(0), r.getInt(1))), nPart, maxIter)
          .map { case (v, c) => Row(v, c) }
      case t: DataType => throw new IllegalArgumentException(
        s"connectedComponents supports string/long/int vertex ids, got $t")
    }
    spark.createDataFrame(labels,
      StructType(Seq(StructField("id", idType), StructField("comp", idType))))
  }

  private def ccLoop[T: Ordering : ClassTag](rawEdges: RDD[(T, T)], nPart: Int,
                                             maxIter: Int): RDD[(T, T)] = {
    val ord = implicitly[Ordering[T]]
    def lo(x: T, y: T): T = if (ord.lteq(x, y)) x else y
    val part = new HashPartitioner(nPart)
    // symmetrized + deduplicated, keyed by dst, co-partitioned with labels
    val eL = rawEdges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .distinct(nPart)
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var labels: RDD[(T, T)] = eL.keys.distinct(nPart)
      .map(v => (v, v)).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // least label among neighbors: edge (dst→src) joins labels on dst
      // (narrow: both sides hash-partitioned), min-combines per src
      val nbrMin = eL.join(labels)
        .map { case (_, (src, lbl)) => (src, lbl) }
        .reduceByKey(part, lo(_, _))
      val next = labels.leftOuterJoin(nbrMin, part)
        .mapValues { case (own, nbr) => lo(own, nbr.getOrElse(own)) }
      // pointer jump: comp ← comp(comp); a label is always a vertex id
      val jumped = next.map { case (v, c) => (c, v) }.partitionBy(part)
        .leftOuterJoin(next, part)
        .map { case (c, (v, cc)) => (v, lo(c, cc.getOrElse(c))) }
        .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
      changed = labels.join(jumped, part)
        .filter { case (_, (o, n)) => o != n }.count()
      labels.unpersist(blocking = false)
      labels = jumped
      iter += 1
    }
    eL.unpersist(blocking = false)
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds (a " +
        s"2^$maxIter-diameter chain); raise maxIter")
    labels
  }
}
