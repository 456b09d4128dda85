package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{FullText, QueryString}
import graft.queries.TextQueries

/** Search CLI — the interactive face of the full-text surface (what
  * a reference user gets from Kibana's search bar over the indexed
  * entities): parse an ES `simple_query_string` query
  * (`+must -not "phrase" should`, the never-throws grammar of
  * ops/QueryString), rank with the engine's BM25 bool composition
  * (the gated q128 operator), and print each hit with its raw-text
  * `<em>` highlight (the q130 kernel — original casing and
  * punctuation preserved).
  *
  * Usage: RunSearch <sfDir> <query> [k]
  *
  * Scale shape: exactly q128's (one analyzer pass, checkpointed
  * candidate postings, postings-only shuffles) plus q130's
  * highlight-after-top-k discipline — the kernel runs on k rows.
  */
object RunSearch {

  /** The hits frame: (doc_id, score, highlighted). Separated from
    * main for RunSearchSpec. `indexDir` switches ranking to the
    * STORED index ([[FullText.simpleQueryStringStored]] — zero
    * corpus scans for the search; the text join below reads only the
    * k hit rows for highlighting, as a deployment's stored-fields
    * lookup would). `generation` (the CLI's `--generation N`) pins
    * the stored index at committed snapshot N via
    * [[graft.io.Layout.withPinnedGeneration]] — the operational face
    * for reproducing a page from a RETAINED generation while newer
    * commits land (pick N from RunStatus's
    * `committed_generations`). The pin resolves every artifact path
    * at plan construction, so the returned frame stays on gen-N. */
  def run(spark: SparkSession, sfDir: String, query: String,
      k: Int = 10, indexDir: Option[String] = None,
      after: Option[(Double, Long)] = None,
      generation: Option[Long] = None): DataFrame = {
    val p = QueryString.parse(query)
    val hlTerms =
      (p.scoringTerms ++ p.phrases.flatten).distinct
    // deep pagination is a stored-index feature: the keyset cursor
    // pushes below the top-k only where an index serves the ranking
    require(after.isEmpty || indexDir.isDefined,
      "search_after paging requires a stored index")
    require(generation.isEmpty || indexDir.isDefined,
      "--generation pins a stored index snapshot — pass the index dir")
    def build(): DataFrame = {
      val hits = indexDir match {
        case Some(idx) =>
          FullText.simpleQueryStringStored(spark, idx, query, k,
            after = after)
        case None => TextQueries.simpleQueryString(spark, sfDir, query, k)
      }
      hits
        .join(Tables.documents(spark, sfDir).select(col("doc_id"),
          col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("score"),
          FullText.highlightRawText(col("text"), hlTerms)
            .as("highlighted"))
        .orderBy(col("score").desc, col("doc_id"))
    }
    generation match {
      case Some(g) =>
        graft.io.Layout.withPinnedGeneration(spark, indexDir.get, g)(
          build())
      case None => build()
    }
  }

  /** HYBRID hits from the persisted indexes: the CLI face of q147 —
    * the lexical leg ranks the query's ANALYZED scoring terms from
    * the stored text index, the vector leg probes the stored vector
    * index for `queryVecId`'s neighbors, both fuse through the SAME
    * `rrfFuse` core as gated q105/q147 (one fusion, three callers —
    * none can drift), and the page highlights like the lexical CLI.
    * Output: (doc_id, rrf_score, highlighted). */
  def runHybrid(spark: SparkSession, sfDir: String, query: String,
      textIdx: String, vecIdx: String, queryVecId: Long = 0L,
      k: Int = 10, generation: Option[Long] = None): DataFrame = {
    val p = QueryString.parse(query)
    val terms = (p.scoringTerms ++ p.phrases.flatten).distinct
    require(terms.nonEmpty, "hybrid search needs scoring terms")
    def build(): DataFrame = {
      val hits = TextQueries.hybridRrfSearchStored(spark, textIdx,
        vecIdx, sfDir, queryId = queryVecId, k = k, terms = terms)
      hits
        .join(Tables.documents(spark, sfDir).select(col("doc_id"),
          col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("rrf_score"),
          FullText.highlightRawText(col("text"), terms)
            .as("highlighted"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }
    // `--generation N` pins the LEXICAL index at N — and the vector
    // index at ITS OWN live generation AS OF ENTRY, so a vector-index
    // commit landing mid-run cannot shift the fused page either: the
    // operator asked for a pinned snapshot, and a half-pinned hybrid
    // (text frozen, vector drifting) would read as nondeterminism.
    // The two indexes mutate independently, so N is meaningless for
    // the vector side — entry-time live is the snapshot the operator
    // observed when choosing N. A never-committed (legacy-root)
    // vector index has no generation to pin and resolves live.
    generation match {
      case Some(g) =>
        graft.io.Layout.withPinnedGeneration(spark, textIdx, g) {
          graft.io.Layout.liveGeneration(spark, vecIdx) match {
            case Some(vg) => graft.io.Layout
              .withPinnedGeneration(spark, vecIdx, vg)(build())
            case None => build()
          }
        }
      case None => build()
    }
  }

  def main(args0: Array[String]): Unit = {
    // --generation N: pin the stored index at committed snapshot N
    // (values from RunStatus's committed_generations); flag-style so
    // the positional contract stays untouched
    val genIdx = args0.indexOf("--generation")
    require(genIdx < 0 || genIdx + 1 < args0.length,
      "--generation requires a value (see RunStatus " +
        "committed_generations)")
    val generation =
      if (genIdx >= 0) Some(args0(genIdx + 1).toLong) else None
    val args =
      if (genIdx >= 0)
        args0.take(genIdx) ++ args0.drop(genIdx + 2)
      else args0
    require(args.length >= 2,
      "usage: RunSearch <sfDir> <query> [k] [storedIndexDir] " +
        "[vectorIndexDir [queryVecId]] [--generation N]")
    val k = if (args.length >= 3) args(2).toInt else 10
    val idxDir = if (args.length >= 4) Some(args(3)) else None
    if (args.length >= 5) {
      // hybrid mode: both stored indexes required
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("graft-search-hybrid")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val vid = if (args.length >= 6) args(5).toLong else 0L
        val rows = runHybrid(spark, args(0), args(1),
          idxDir.get, args(4), vid, k, generation).collect()
        println(s"${rows.length} hybrid hits for: ${args(1)}")
        rows.foreach { r =>
          val snippet = r.getString(2)
          val short =
            if (snippet.length <= 160) snippet
            else snippet.take(157) + "..."
          println(f"${r.getLong(0)}%8d  ${r.getDouble(1)}%8.6f  $short")
        }
      } finally spark.stop()
      return
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-search")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val rows = run(spark, args(0), args(1), k, idxDir,
        generation = generation).collect()
      println(s"${rows.length} hits for: ${args(1)}")
      rows.foreach { r =>
        val snippet = r.getString(2)
        val short =
          if (snippet.length <= 160) snippet
          else snippet.take(157) + "..."
        println(f"${r.getLong(0)}%8d  ${r.getDouble(1)}%8.4f  $short")
      }
    } finally spark.stop()
  }
}
