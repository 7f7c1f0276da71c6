package graft.queries

/** The run-before-dump ORACLE SPLICE REGISTRY — one keyed map replacing
  * the two dozen per-query `@volatile var` slots that all followed the
  * identical lifecycle (the round-11 refactor ask): a query stashes the
  * metadata-sized artifact it trained (centroids, codebooks, an LSH
  * config, a PCA model, an export dir) when it RUNS; its oracle builder
  * reads the slot when oracle_sql.json is DUMPED. Verify runs every
  * query before dumping, so by dump time each slot holds exactly the
  * artifact the stored result was built with.
  *
  * Contract (unchanged from the per-var form):
  *  - keys are per-query (`"s37.cents"`, `"d73.config"`, …) — every
  *    query stays independently runnable, never borrowing another's
  *    state, and a filtered Verify of one query still emits its oracle;
  *  - [[get]] before the query has run returns None and the consuming
  *    oracle is omitted → the driver records a rows-only check;
  *  - values are tiny trained artifacts (centroids by nlist, codebooks
  *    by k·dim, PCA cells by dim²), never row data.
  *
  * `grep -rn "OracleStash.put"` now lists every run-before-dump
  * dependency in the codebase in one pass.
  */
private[queries] object OracleStash {
  /** centroid matrix (nlist × dim) */
  type Cents = Array[Array[Double]]
  /** PQ codebooks (subspace × k × subdim) */
  type Books = Array[Array[Array[Double]]]
  /** PCA model: (mean, components) */
  type Pca = (Array[Double], Array[Array[Double]])

  private val slots = scala.collection.concurrent.TrieMap.empty[String, Any]

  def put(key: String, value: Any): Unit = slots.put(key, value)

  /** The caller asserts the slot's type; a wrong cast surfaces at the
    * read site (same guarantee the old typed vars gave, now per-key). */
  def get[T](key: String): Option[T] = slots.get(key).map(_.asInstanceOf[T])
}
