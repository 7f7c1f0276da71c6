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

  /** The closed key set. The old per-var form made a slot-name typo a
    * COMPILE error; a stringly-keyed map would instead silently
    * downgrade the query's gate to rows-only (get of a never-put key →
    * None → oracle omitted). This list restores the loud failure: put
    * and get both reject unknown keys at call time. Adding a slot =
    * adding a line here — which keeps this the one greppable inventory
    * of every run-before-dump dependency. */
  private val Known: Set[String] = Set(
    "s37.cents", "s44.books", "d53.cents", "s45.model", "s57.model",
    "s62.model", "s58.cents", "s60.cents", "s61.cents", "s63.cents",
    "s64.cents", "s65.cents", "s72.cents", "s73.cents", "s76.cents",
    "s77.cents", "s78.cents", "s80.cents", "d36.bits", "d56.bits", "d73.config",
    "d74.config", "s66.pca", "s67.pca", "c60.dir", "j61.dir")

  private val slots = scala.collection.concurrent.TrieMap.empty[String, Any]

  def put(key: String, value: Any): Unit = {
    require(Known(key), s"unknown OracleStash slot '$key' — add it to Known")
    slots.put(key, value)
  }

  /** The caller asserts the slot's type. Erasure caveat: the cast is
    * checked at first USE of the value, not at this call — a mistyped
    * tuple slot surfaces inside the consuming oracle builder, so keep
    * the type argument next to its put site's value type. */
  def get[T](key: String): Option[T] = {
    require(Known(key), s"unknown OracleStash slot '$key' — add it to Known")
    slots.get(key).map(_.asInstanceOf[T])
  }
}
