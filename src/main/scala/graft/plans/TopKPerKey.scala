package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/** Whole-operator extension demo (SURVEY §4 / the custom-operator ladder's
  * last rung): top-k rows per key as a FIRST-CLASS physical operator.
  *
  * Spark expresses "top N per group" as `row_number().over(Window)` +
  * filter, whose physical plan SORTS every partition fully — at 100 TB
  * that is an O(n log n) sort (and possible spill) of each partition for
  * an answer that only needs k rows per key. [[TopKPerKeyExec]] keeps one
  * bounded k-row heap per key per partition instead: O(n log k), no sort
  * buffer, no spill, same rows out.
  *
  * Wiring: [[TopKPerKeyNode]] (logical) → [[TopKStrategy]] (planner rule,
  * installed by [[GraftExtensions]]) → [[TopKPerKeyExec]] (physical). The
  * exec declares `ClusteredDistribution(keys)`, so Catalyst inserts the
  * hash exchange exactly like any keyed aggregate — AQE still manages the
  * shuffle. Output order within a key is unspecified (append a sort for
  * presentation, as with any aggregate).
  *
  * Memory contract: a partition holds ≤ k retained rows per key — the
  * same footprint class as a hash aggregate. When retained rows in one
  * partition cross `maxRetainedPerPartition` (huge k·|keys|), the
  * partition DEGRADES to sort-based eviction instead of throwing or
  * grinding into an executor OOM: the buffered heaps plus the remaining
  * input stream into Spark's spill-capable external row sorter (ordered
  * by key, then the sort order), and the sorted stream emits the first k
  * rows of each key group — exactly the Window/row_number physical shape,
  * chosen per-partition at runtime. Same rows out on either path
  * (spec-pinned); the heap path remains the O(n log k), sort-free fast
  * path every sane-cardinality partition takes.
  */
final case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan,
    maxRetainedPerPartition: Long = TopKPerKeyExec.DefaultMaxRetained,
    maxRetainedBytesPerPartition: Long = TopKPerKeyExec.DefaultMaxRetainedBytes)
  extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child, maxRetained, maxBytes) =>
      TopKPerKeyExec(k, keys, order, planLater(child), maxRetained,
        maxBytes) :: Nil
    case _ => Nil
  }
}

object TopKPerKeyExec {
  /** Default retained-row cap per partition: ~8M rows ≈ a few hundred MB
    * of UnsafeRow copies for typical narrow rows — far below executor
    * memory, far above any sane top-k working set.
    */
  val DefaultMaxRetained: Long = 8L * 1024 * 1024

  /** Default retained-BYTE cap per partition. The row cap alone is not a
    * memory rail: the buffered UnsafeRow copies live OUTSIDE the task
    * memory manager, so 8M rows of kilobyte-wide documents is 8-32 GB of
    * untracked heap — an executor OOM in the fast path the degrade
    * contract promises never to hit. Bytes are tracked alongside rows
    * (including the replace path, whose row count is constant but whose
    * bytes can creep upward) and EITHER cap degrades the partition to
    * the spill-capable sorter.
    */
  val DefaultMaxRetainedBytes: Long = 512L * 1024 * 1024
}

final case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    maxRetainedPerPartition: Long = TopKPerKeyExec.DefaultMaxRetained,
    maxRetainedBytesPerPartition: Long = TopKPerKeyExec.DefaultMaxRetainedBytes)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = output
    val numKeys = keys
    val sortOrder = order
    val limit = k
    val maxRetained = maxRetainedPerPartition
    val maxRetainedBytes = maxRetainedBytesPerPartition
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(numKeys, childOutput)
      // identity projection instead of asInstanceOf[UnsafeRow]: when the
      // required distribution is already satisfied WITHOUT an inserted
      // shuffle (SinglePartition input, row-based sources) the iterator
      // can carry non-Unsafe InternalRows — the pattern Spark's own
      // row-consuming execs use
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val base = GenerateOrdering.generate(sortOrder, childOutput)
      // PriorityQueue dequeues its MAX: ordered by the sort order itself,
      // the head is the WORST retained row — the eviction candidate
      val rowOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = base.compare(a, b)
      }
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      // the cap counts rows ACTUALLY buffered (a worst-case keys·k bound
      // would trip spuriously for large k over sparse keys — e.g. the ANN
      // shortlist's k = 15% of the corpus where most keys hold far fewer
      // than k rows); the counter moves only when a heap grows, zero cost
      // on the replace path. Crossing it switches this partition to the
      // sort-based eviction path below — degrade, never throw/OOM
      var retained = 0L
      var retainedBytes = 0L
      var overflow = false
      while (it.hasNext && !overflow) {
        val row = it.next()
        val u = row match {
          case ur: UnsafeRow => ur
          case other => toUnsafe(other)
        }
        val key = keyProj(u)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
            val kc = key.copy() // the projection reuses its buffer: copy keys
            retainedBytes += kc.getSizeInBytes
            heaps.put(kc, h)
            h
        }
        if (heap.size < limit) {
          retained += 1
          retainedBytes += u.getSizeInBytes
          if (retained > maxRetained || retainedBytes > maxRetainedBytes)
            overflow = true
          heap += u.copy() // iterator reuses row buffers too
        }
        else if (base.compare(u, heap.head) < 0) {
          // replace path: row count is constant but BYTES can creep when
          // the replacement is wider than the evicted row
          retainedBytes += u.getSizeInBytes - heap.dequeue().getSizeInBytes
          if (retainedBytes > maxRetainedBytes) overflow = true
          heap += u.copy()
        }
      }
      if (!overflow)
        heaps.valuesIterator.flatMap(_.iterator.map(_.asInstanceOf[InternalRow]))
      else {
        // Sort-based eviction: the heap working set crossed the cap, so
        // buffering k rows per key no longer fits memory. Feed everything
        // retained so far plus the rest of the input into Spark's
        // spill-capable external row sorter, ordered by (keys, sort
        // order); the sorted stream then yields each key's rows
        // best-first, and the first k per key group are exactly the
        // heap-path rows. Constant sort prefix (comparisons fall through
        // to the full record comparator): correct, and this path is the
        // degraded lane — the heap path is where performance lives.
        logWarning(s"TopKPerKeyExec: retained cap crossed (rows " +
          s"$retained/$maxRetained, bytes $retainedBytes/$maxRetainedBytes, " +
          s"k=$limit over ${heaps.size}+ keys); degrading this partition " +
          "to sort-based eviction (spillable)")
        val fullOrder = numKeys.map(k => SortOrder(k, Ascending)) ++ sortOrder
        val ord = GenerateOrdering.generate(fullOrder, childOutput)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val zero = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow) = {
            zero.isNull = false; zero.value = 0L; zero
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          DataTypeUtils.fromAttributes(childOutput), ord,
          PrefixComparators.LONG, prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, false)
        heaps.valuesIterator.foreach(_.foreach(sorter.insertRow))
        heaps.clear()
        while (it.hasNext) {
          it.next() match {
            case ur: UnsafeRow => sorter.insertRow(ur)
            case other => sorter.insertRow(toUnsafe(other))
          }
        }
        var curKey: UnsafeRow = null
        var emitted = 0
        sorter.sort().filter { row =>
          val k = keyProj(row)
          if (curKey == null || k != curKey) { curKey = k.copy(); emitted = 0 }
          emitted += 1
          emitted <= limit
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
