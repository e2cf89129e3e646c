package graft.core

/** Test/bench hook: drop the process-level docTerms/stats caches so a
  * repeated build re-runs the tokenize stage instead of reusing the
  * persisted relation.
  */
object AnalysisCacheReset {
  def reset(): Unit = Analysis.clearProcessCaches()
}
